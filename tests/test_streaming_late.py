"""Watermark / late-data policy: events older than the watermark are dropped
in append mode — the windowed aggregate for an already-finalized window never
updates. This is the late-data contract a 100 TB streaming pipeline relies on
for bounded state."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

# TimestampNTZType mirrors the driver's parquet (`timestamp[us]`, no tz) —
# round 2 shipped with TimestampType here, which is exactly why the suite
# missed the NTZ watermark regression. The stream casts NTZ → TIMESTAMP the
# same way production `_events_stream` does.
SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


def _mk(spark, offsets_minutes):
    rows = [(T0 + dt.timedelta(minutes=m), 1, 1.0) for m in offsets_minutes]
    return spark.createDataFrame(rows, SCHEMA)


def test_late_rows_dropped_after_watermark(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        # batch 1: events at T0+3h..T0+4h → watermark advances to ~T0+3h
        _mk(spark, [180, 200, 240]).coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
        agg = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").cast("long").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("late_test")
            .start()
        )
        try:
            q.processAllAvailable()
            # batch 2: one LATE event at T0 (hours behind the watermark) and
            # one fresh event at T0+6h that finalizes earlier windows
            _mk(spark, [0, 360]).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()

        got = {r.ws: r.n for r in spark.table("late_test").collect()}
        t0_epoch = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
        # the finalized 3h/4h windows were emitted with their on-time counts
        assert got.get(t0_epoch + 3 * 3600) == 2
        assert got.get(t0_epoch + 4 * 3600) == 1
        # the late T0 event was DROPPED: its window is absent from the output
        assert t0_epoch not in got
