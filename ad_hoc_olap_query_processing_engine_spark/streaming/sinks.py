"""Streaming sinks (SURVEY.md §2.3 — NOT-IN-REFERENCE).

foreach_batch_parquet_sink  the exactly-once file-sink pattern: each
    micro-batch lands in its own ``batch_id=N`` partition directory with
    ``overwrite`` mode, so a retried batch REPLACES its own output instead of
    appending duplicates (idempotent writes + checkpointed offsets =
    effectively-exactly-once, the standard foreachBatch recipe). The
    checkpoint directory remembers processed source offsets, so a restarted
    query skips everything already committed — both halves are asserted in
    tests/test_streaming_sink.py.

At scale this is the Kafka→lakehouse landing pattern: swap the parquet write
for MERGE INTO / transactional commit and the same batch-id idempotency
reasoning holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def foreach_batch_parquet_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, on_batch=None
):
    """Start a foreachBatch query writing each micro-batch idempotently to
    ``out_dir/batch_id=N``. Returns the StreamingQuery (caller drains/stops).

    ``on_batch(batch_id)``, if given, runs AFTER the batch's write lands and
    BEFORE Spark commits the batch's offsets — the two-phase-commit gap.
    Intended for per-batch telemetry; the fault-injection test raises from it
    to prove a crash in that gap redelivers the batch instead of losing or
    duplicating it (tests/test_streaming_sink.py).
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        # overwrite THIS batch's directory only: a redelivered batch (failure
        # between write and checkpoint commit) rewrites the same files
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        if on_batch is not None:
            on_batch(batch_id)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_batches(spark, out_dir: str) -> DataFrame:
    """Read everything the sink has landed (batch_id becomes a partition
    column)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    )
