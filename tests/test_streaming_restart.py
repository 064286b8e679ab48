"""Checkpoint/restart recovery: a streaming aggregation stopped mid-stream
and restarted from the same checkpointLocation must resume source offsets AND
aggregation state — counts spanning the stop point come out exactly once, no
re-emission, no loss. This is the fault-tolerance contract a production
streaming pipeline (Kafka → windowed agg → sink) depends on; the memory-sink
operators in streaming/windows.py drain in one run, so this is the one
behavior only a kill-and-resume test can certify."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


def _write(spark, src, offsets_minutes):
    rows = [(T0 + dt.timedelta(minutes=m), m % 3, 1.0) for m in offsets_minutes]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _agg(spark, src):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("ws"), "user_id", "n")
    )


def test_restart_resumes_offsets_and_state(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "out")
        os.makedirs(src)

        # hour-0 events arrive in TWO files; the query is stopped between
        # them, so the hour-0 window's partial count lives only in
        # checkpointed state across the restart
        _write(spark, src, [0, 10, 20])

        def start():
            return (
                _agg(spark, src)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # second half of hour 0 + hour 2 events that push the watermark past
        # hour 0 and hour 1, finalizing those windows AFTER the restart
        _write(spark, src, [30, 40, 130])

        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = (
            spark.read.schema("ws long, user_id long, n long")
            .parquet(out)
            .groupBy("ws", "user_id")
            .agg(F.sum("n").alias("n"), F.count(F.lit(1)).alias("emissions"))
            .collect()
        )
        by_key = {(r.ws, r.user_id): r for r in got}
        h0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
        # hour-0 counts span the restart: user 0 saw minutes 0,30; user 1
        # saw 10,40; user 2 saw 20 — all exactly once
        assert by_key[(h0, 0)].n == 2
        assert by_key[(h0, 1)].n == 2
        assert by_key[(h0, 2)].n == 1
        # each finalized (window, user) emitted exactly once — restart did
        # not re-emit hour 0
        assert all(r.emissions == 1 for r in got), got
        # the unfinalized hour-2 window (nothing beyond its own watermark)
        # must NOT have been emitted
        assert all(r.ws == h0 for r in got), got


def test_restart_with_no_new_data_emits_nothing_new(spark):
    """A pure restart (same checkpoint, no new files) must be a no-op: the
    sink gains zero rows — offsets are remembered, nothing replays."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        out = os.path.join(tmp, "out")
        os.makedirs(src)
        _write(spark, src, [0, 10, 90])  # watermark passes hour 0 → emitted

        def start():
            return (
                _agg(spark, src)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n1 = spark.read.schema("ws long, user_id long, n long").parquet(out).count()

        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n2 = spark.read.schema("ws long, user_id long, n long").parquet(out).count()
        assert n1 == n2, f"restart replayed rows: {n1} -> {n2}"


def test_trigger_available_now_drains_and_stops(spark):
    """Trigger.AvailableNow: the modern batch-drain mode (successor to the
    deprecated trigger(once=True)) — processes everything available in
    bounded micro-batches, then stops the query BY ITSELF (no
    processAllAvailable babysitting). The contract a scheduled
    incremental-ingest job relies on: drain, commit offsets, exit."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        os.makedirs(src)
        _write(spark, src, [0, 10, 90])   # file 1
        _write(spark, src, [150])         # file 2 — forces multi-batch drain

        q = (
            _agg(spark, src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "availableNow query did not self-stop"
        assert not q.isActive
        got = spark.read.schema("ws long, user_id long, n long").parquet(out)
        # watermark reached 150-30=120 min → hour-0 (end 60) and hour-1
        # (end 120) finalized; hour-2 stays in state for the NEXT drain
        assert got.agg(F.sum("n")).collect()[0][0] == 3  # events at 0,10,90


def test_update_mode_emits_only_changed_keys(spark):
    """UPDATE output mode: each micro-batch emits only the (window, key)
    rows whose aggregate CHANGED — the mode a keyed KV/metrics sink wants
    (append withholds until the watermark; complete rewrites the world).
    Batch 2 touches hour-0/user-0 only, so the second wave of emissions
    must contain that key's new count and nothing for untouched keys."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        # batch 1: users 0,1,2 in hour 0
        _write(spark, src, [0, 10, 20])

        q = (
            _agg(spark, src)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("upd_test")
            .start()
        )
        try:
            q.processAllAvailable()
            wave1 = spark.table("upd_test").count()
            assert wave1 == 3  # one row per (hour0, user)
            # batch 2: ONE more event for user 0 in hour 0 (minute 30 % 3 == 0)
            _write(spark, src, [30])
            q.processAllAvailable()
            rows = spark.table("upd_test").collect()
            # total emissions: 3 from wave 1 + exactly 1 updated key
            assert len(rows) == 4, rows
            # the updated emission carries user 0's NEW count (2) — checked
            # order-independently (collect order across micro-batches is not
            # a documented contract): user 0's emissions are the multiset
            # {1, 2}, every other key emitted exactly once with n == 1
            h0 = min(r.ws for r in rows)
            per_key: dict = {}
            for r in rows:
                per_key.setdefault((r.ws, r.user_id), []).append(r.n)
            assert sorted(per_key[(h0, 0)]) == [1, 2]
            for key, ns in per_key.items():
                if key != (h0, 0):
                    assert ns == [1], (key, ns)
        finally:
            q.stop()


def test_drop_duplicates_within_watermark(spark):
    """dropDuplicatesWithinWatermark (Spark 3.5+): duplicates of a key whose
    event times fall within the watermark delay are suppressed, but once the
    watermark passes the first event's horizon the key's state is evicted
    and a LATER duplicate re-emits — the bounded-state streaming dedup that
    plain dropDuplicates (unbounded state per key) cannot provide. Batches
    are driven one file per trigger so watermark advancement between
    duplicates is deterministic."""
    import os
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        # batch 1: user 0 at t+0 and a SAME-KEY duplicate at t+9min (9 % 3
        # == 0; inside the 30-min delay) → one emission for user 0, plus
        # user 1 at t+10
        _write(spark, src, [0, 9, 10])

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        deduped = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["user_id"])
            .select("user_id", F.col("ts").cast("long").alias("t"))
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("ddww_test")
            .start()
        )
        try:
            q.processAllAvailable()
            t0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
            first = {(r.user_id, r.t) for r in spark.table("ddww_test").collect()}
            # the t+9 duplicate of user 0 is suppressed; distinct keys emit
            assert first == {(0, t0), (1, t0 + 600)}, first
            # batch 2: user 0 again at t+6h. The watermark only advances
            # AFTER a batch (to batch-1's max − delay = t−20min), so user 0's
            # state is still live AT ARRIVAL and this event is SUPPRESSED —
            # even though it is hours past the 30-min delay. Completing the
            # batch then moves the watermark to t+5h30, evicting the state.
            _write(spark, src, [360])
            q.processAllAvailable()
            # batch 3: user 0 at t+7h finds no state → must RE-emit.
            _write(spark, src, [420])
            q.processAllAvailable()
            rows = [(r.user_id, r.t) for r in spark.table("ddww_test").collect()]
            user0 = sorted(t for u, t in rows if u == 0)
            assert user0 == [t0, t0 + 420 * 60], rows
        finally:
            q.stop()
