"""ts_ewma end-to-end pins: the JVM 8-LAG window must reproduce the
sequential truncated-tap EWMA definition (test_kernel_properties.py's
_ewma_reference) on an adversarial SIGNED series — Spark's DIV truncates
toward zero like DuckDB's //, so sign coverage here proves the operator is
not silently relying on the events fixture's non-negative value range."""

from __future__ import annotations

import math

from ad_hoc_olap_query_processing_engine_spark.operators.timeseries import ts_ewma

from .test_kernel_properties import _ewma_reference


def test_ewma_spark_matches_reference_on_signed_series(spark, tmp_path):
    # two users; user 7's series mixes signs and magnitudes that make the
    # weighted numerator cross zero mid-ramp (the trunc-vs-floor trap)
    rows = [
        (7, [3.1417, -0.0001, -251.7, 0.0, 42.5, -42.4999, 1.0, 2.0, -3.0, 4.0]),
        (9, [-1.5, -1.5, 100.0]),
    ]
    data = []
    for uid, vals in rows:
        for i, v in enumerate(vals):
            data.append((uid * 1000 + i, i + 1, uid, float(v)))
    df = spark.createDataFrame(
        data, "event_id bigint, sec bigint, user_id bigint, value double"
    ).selectExpr("event_id", "timestamp_seconds(sec) AS ts", "user_id", "value")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.user_id, r.event_id): r.ewma_fp
        for r in ts_ewma(spark, str(tmp_path)).collect()
    }
    for uid, vals in rows:
        xq = [math.floor(v * 10000.0) for v in vals]
        expected = _ewma_reference(xq)
        for i, exp in enumerate(expected):
            assert got[(uid, uid * 1000 + i)] == exp, (uid, i)
