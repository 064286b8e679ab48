"""Streaming observability cert: ``df.observe`` metrics on a STREAM.

plans/observed_counts certifies df.observe on batch; production streaming
jobs additionally rely on per-batch observed metrics (row counts, value
sums, null tallies) surfacing through the StreamingQueryProgress — that's
how a pipeline alarms on "this microbatch ingested zero rows" or "the sum
drifted" without a second pass over the data.  This cert runs a file-source
stream with observe() + availableNow and asserts the custom metrics
reported through progress equal the ground truth computed from the same
files in batch — the numbers the ops dashboard would key on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_stream_observe_metrics_match_batch_truth(spark, tmp_path):
    src = str(tmp_path / "src")
    batch = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .limit(500)
    )
    batch.write.parquet(src)
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    truth = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
    ).collect()[0]

    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(src)
        .observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).alias("sum_price_c"),  # integer cents: exact through the progress JSON
            F.count_if(F.col("o_totalprice").isNull()).alias("n_null_price"),
        )
    )
    seen: list[dict] = []
    q = (
        stream.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        for p in q.recentProgress:
            om = (p.get("observedMetrics") or {}).get("ingest")
            if om:
                seen.append(om)
    finally:
        q.stop()

    assert seen, "no observed metrics surfaced through StreamingQueryProgress"
    assert sum(m["n_rows"] for m in seen) == truth.n
    assert sum(m["sum_price_c"] for m in seen) == truth.s
    assert sum(m["n_null_price"] for m in seen) == 0
