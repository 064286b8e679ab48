"""Session-scoped materialized-index cache.

Several operator families share a maintained artifact (shingle postings,
verified near-dup pairs, SRP projections, the hourly rollup tier): at
warehouse scale these are tables a pipeline materializes once and many jobs
read. Locally the analogue is a persisted DataFrame built once per
(SparkSession, sf_dir). One helper instead of a hand-rolled dict per module,
with eviction of entries belonging to dead sessions — their persisted blocks
died with the SparkContext, and keeping the references would leak DataFrame
objects forever in a long-lived process that recreates sessions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHES: dict[str, dict[tuple[str, str], DataFrame]] = {}


def session_cached(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Get-or-build the named artifact for (this session, this sf_dir).

    ``build`` should return an already-persisted (or checkpointed)
    DataFrame; it runs at most once per live session per sf_dir."""
    cache = _CACHES.setdefault(name, {})
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    if key not in cache:
        for stale in [k for k in cache if k[0] != app]:
            cache.pop(stale)
        cache[key] = build()
    return cache[key]
