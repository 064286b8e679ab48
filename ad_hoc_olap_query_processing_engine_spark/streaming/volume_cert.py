"""High-volume streaming certification (round-9 verdict ask #3).

The per-query stream certs drain one small file in one micro-batch; this
module is the streaming analogue of the sfN batch sweeps: a many-micro-batch,
millions-of-rows pass with REAL watermark pressure, asserting from the
engine's own StreamingQueryProgress metrics that

  * no input row is lost (sum of numInputRows == rows generated),
  * the watermark actually drops the designed-late rows
    (numRowsDroppedByWatermark == the late-row count, and none of the
    late rows surface in the output),
  * session state is EVICTED as the watermark advances (peak state rows
    stay bounded by the active-session count instead of growing with the
    number of micro-batches — the no-OOM property at 100 TB), and
  * the emitted sessions EXACTLY equal a batch recomputation over the
    on-time rows (stream/batch parity at volume).

Data layout (deterministic, no RNG): file i covers a 2-hour activity window;
each real user emits one burst per file (events 60 s apart, well inside the
30-minute session gap), so every (user, file) is exactly one session and
cross-file gaps always split sessions.  Files i >= LATE_FROM also carry rows
stamped 6+ hours behind the already-advanced watermark (marker user ids), and
a final far-future flush file pushes the watermark past every real session so
append mode finalizes them all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1_704_067_200  # 2024-01-01 00:00:00 UTC
FILE_SPAN_S = 7_200  # each file covers 2 h of event time
SESSION_GAP = "30 minutes"
WATERMARK = "1 hour"
LATE_FROM = 5  # files >= this index carry designed-late rows
LATE_MARKER = 10_000_000  # late rows use user_id >= this (excluded from parity)
FLUSH_USER = -1  # the far-future flush row's user id


def generate_stream_files(
    out_dir: str,
    n_files: int = 40,
    n_users: int = 2_000,
    events_per_user: int = 25,
    n_late_users: int = 200,
) -> dict:
    """Write the deterministic multi-file event stream; returns counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_rows = n_late = 0
    for i in range(n_files):
        users, tss = [], []
        base = BASE_EPOCH + i * FILE_SPAN_S
        for u in range(n_users):
            start = base + (u % 60) * 60  # burst start inside the file window
            for k in range(events_per_user):
                users.append(u)
                tss.append(start + k * 60)
        if i >= LATE_FROM:
            # 6+ h behind the watermark established by files [0, i): with a
            # 1 h delay the watermark at batch i is ~(i-1)*2 h + ~18 min, so
            # ts = (i-4)*2 h is late by >4 h — deterministically dropped
            for u in range(n_late_users):
                users.append(LATE_MARKER + u)
                tss.append(BASE_EPOCH + (i - 4) * FILE_SPAN_S + u)
                n_late += 1
        n_rows += len(users)
        t = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(
                    [v * 1_000_000 for v in tss], pa.timestamp("us", "UTC")
                ),
            }
        )
        path = os.path.join(out_dir, f"f{i:04d}.parquet")
        pq.write_table(t, path)
        os.utime(path, (BASE_EPOCH + i, BASE_EPOCH + i))  # deterministic order
    # flush: one far-future row finalizes every real session under append mode
    flush_ts = BASE_EPOCH + (n_files + 10) * FILE_SPAN_S
    t = pa.table(
        {
            "user_id": pa.array([FLUSH_USER], pa.int64()),
            "ts": pa.array([flush_ts * 1_000_000], pa.timestamp("us", "UTC")),
        }
    )
    path = os.path.join(out_dir, f"f{n_files:04d}_flush.parquet")
    pq.write_table(t, path)
    os.utime(path, (BASE_EPOCH + n_files, BASE_EPOCH + n_files))
    return {
        "n_files": n_files + 1,
        "n_rows": n_rows + 1,
        "n_late_rows": n_late,
        "n_real_sessions": n_files * n_users,
    }


def _read_stream(spark: SparkSession, data_dir: str) -> DataFrame:
    schema = spark.read.parquet(data_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch: the
        .parquet(data_dir)  # rate throttle that makes the watermark ADVANCE
    )


def _run_to_completion(agg: DataFrame, spark: SparkSession, mode: str, name: str):
    """Start → drain → stop; returns (result_df, progress_list)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p is not None]
    finally:
        q.stop()
    return spark.table(name), progress


def session_volume_cert(spark: SparkSession, data_dir: str, gen: dict) -> dict:
    """Append-mode session windows under watermark pressure; exact parity."""
    ev = _read_stream(spark, data_dir).withWatermark("ts", WATERMARK)
    agg = ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out, progress = _run_to_completion(agg, spark, "append", "vol_session")
    emitted = out.select(
        F.col("w.start").cast("long").alias("session_start"),
        F.col("w.end").cast("long").alias("session_end"),
        "user_id",
        "n_events",
    ).cache()

    n_input = sum(int(p["numInputRows"]) for p in progress)
    dropped = sum(
        int(so.get("numRowsDroppedByWatermark", 0))
        for p in progress
        for so in p.get("stateOperators", [])
    )
    peak_state = max(
        (int(so.get("numRowsTotal", 0)) for p in progress
         for so in p.get("stateOperators", [])),
        default=0,
    )

    # exact parity: batch session windows over the on-time (real-user) rows
    expected = (
        spark.read.parquet(data_dir)
        .filter((F.col("user_id") >= 0) & (F.col("user_id") < LATE_MARKER))
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    got_real = emitted.filter(
        (F.col("user_id") >= 0) & (F.col("user_id") < LATE_MARKER)
    )
    n_expected = expected.count()
    n_got = got_real.count()
    n_diff = got_real.exceptAll(expected).count() + expected.exceptAll(got_real).count()
    n_late_emitted = emitted.filter(F.col("user_id") >= LATE_MARKER).count()
    emitted.unpersist()

    report = {
        "query": "session_window append",
        "rows_generated": gen["n_rows"],
        "rows_input": n_input,
        "rows_dropped_by_watermark": dropped,
        "late_rows_designed": gen["n_late_rows"],
        "late_rows_emitted": n_late_emitted,
        "sessions_expected": n_expected,
        "sessions_emitted": n_got,
        "sessions_diff": n_diff,
        "peak_state_rows": peak_state,
        "n_batches": len(progress),
    }
    assert n_input == gen["n_rows"], report
    assert dropped == gen["n_late_rows"], report
    assert n_late_emitted == 0, report
    assert n_diff == 0 and n_got == n_expected == gen["n_real_sessions"], report
    # eviction: bounded by sessions in flight (≤ ~2 files' worth of users +
    # late/flush slack), never the n_files × n_users total the stream saw
    assert peak_state < 3 * (gen["n_real_sessions"] // max(1, gen["n_files"] - 1)) + gen["n_late_rows"], report
    report["verdict"] = "PASS"
    return report


def stateful_volume_cert(spark: SparkSession, data_dir: str, gen: dict) -> dict:
    """applyInPandasWithState at volume: cumulative per-user counts through
    the Python state channel must equal a batch GROUP BY exactly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _read_stream(spark, data_dir).select("user_id")

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out, progress = _run_to_completion(agg, spark, "update", "vol_stateful")
    # update mode re-emits a user's cumulative count every batch that touches
    # it; the final value per user is the max
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    expected = spark.read.parquet(data_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    n_diff = final.exceptAll(expected).count() + expected.exceptAll(final).count()
    n_input = sum(int(p["numInputRows"]) for p in progress)
    report = {
        "query": "applyInPandasWithState update",
        "rows_generated": gen["n_rows"],
        "rows_input": n_input,
        "users_diff": n_diff,
        "n_batches": len(progress),
    }
    assert n_input == gen["n_rows"], report
    assert n_diff == 0, report
    report["verdict"] = "PASS"
    return report
