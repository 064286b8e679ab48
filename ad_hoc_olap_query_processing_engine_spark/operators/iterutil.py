"""Iteration-safe checkpointing.

``Dataset.checkpoint`` (and ``localCheckpoint``) captures the checkpointed
PHYSICAL plan's metadata — output partitioning / ordering expressions — into
the ``LogicalRDD`` it returns.  In an iterative driver loop (connected
components, PageRank, k-core, Lloyd rounds, BPE merges) each round's
LogicalRDD then embeds the previous round's captured metadata, the structure
NESTS round over round, and Catalyst traversals over it go EXPONENTIAL:
measured on a 60-node path graph, round time was flat at ~0.6 s through
round 6 and then ×~7 per round (0.6 → 2.0 → 8.0 → 42 → 265 s) with a
CONSTANT logical plan string, identical with AQE off and with an extra
repartition.  Both planning and execution blow up, because both walk the
nested metadata.

``truncated_checkpoint`` cures it: materialize via localCheckpoint as
before, then rebuild the frame as a BARE LogicalRDD over the same
materialized rows (``internalCreateDataFrame`` — the same JVM constructor
PySpark's own ``createDataFrame`` uses), which carries no captured
partitioning/ordering.  Zero data movement, JVM-side only; losing the
partitioning metadata costs nothing here because every consumer shuffles by
its own join/group keys anyway.  Falls back to the plain checkpoint if the
internal constructor ever moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reclaim_shuffles(df: DataFrame) -> None:
    """Nudge the JVM so Spark's ContextCleaner reclaims shuffle files whose
    RDDs are no longer referenced.  Long iterative jobs otherwise carry
    EVERY upstream stage's shuffle files to job end, because a 48g heap
    that is barely used never runs a full GC and the cleaner is driven by
    weak references: at the sf100 probe the dead LSH-pipeline shuffles
    (~35 GB) starved the CC rounds of local scratch (ENOSPC).  On cluster
    NVMe this is latency-neutral housekeeping; on bounded scratch it is
    the difference between fitting and failing.

    Order matters: Py4J pins a JVM-side strong reference for every object
    handle Python still holds, and those are released by PYTHON
    finalizers — so collect Python first, then ask the JVM to GC (which
    lets the weak-reference-driven ContextCleaner enqueue the dead
    shuffles/RDDs for deletion)."""
    import gc

    gc.collect()
    try:
        df.sparkSession.sparkContext._jvm.System.gc()  # noqa: SLF001
    except Exception:  # pragma: no cover - cleanup is best-effort
        pass


def truncated_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint + strip captured plan metadata (see module doc)."""
    c = df.localCheckpoint()
    try:
        spark = c.sparkSession
        jdf = spark._jsparkSession.internalCreateDataFrame(  # noqa: SLF001
            c._jdf.queryExecution().toRdd(), c._jdf.schema(), False
        )
        return DataFrame(jdf, spark)
    except Exception:  # pragma: no cover - private-API drift safety net
        return c
