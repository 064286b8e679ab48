"""Mergeable-sketch rollups (SURVEY.md §2.3 approx-aggregate row, continued).

The reference recomputes every aggregate from the base table per query
(/root/reference/src/QueryProcessor1.java:113-302 — no reuse between
queries, let alone between granularities).  The warehouse-scale pattern
this module certifies is the opposite: distinct-count SKETCHES are
aggregated once at a fine granularity and then MERGED to coarser ones —
COUNT(DISTINCT) does not re-roll (distinct users per hour don't sum to
distinct users per day), but HLL sketches union losslessly, so the daily
NDV comes from the hourly tier without touching raw events again.
Same tiering contract as func_multires_rollup's sums, extended to the one
aggregate family that is otherwise non-rollable.

func_sketch_rollup — hourly Apache DataSketches HLL sketches of event
users (`hll_sketch_agg`), unioned per day (`hll_union_agg`), reported
beside the EXACT daily distinct count with an error-envelope check.  At
100 TB only the hourly tier ever scans facts; every coarser granularity
is a sketch-merge over tier rows (bytes per group, not users per group).

Determinism/oracle contract: the sketch estimate is deterministic for a
given input multiset but not SQL-portable, so (like rel_approx_distinct)
the HASH-MATCHED columns are the exact NDV plus a boolean pinning the
estimate inside ±5% — the DuckDB oracle states the envelope as TRUE and
the Spark side must land inside it for the hash to agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

HLL_LGK = 14  # 2^14 buckets → ~0.8% rse; envelope below allows 5%


def func_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    hourly = e.groupBy(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    daily_est = hourly.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    exact = e.groupBy(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    rel_err = F.abs(F.col("__est") - F.col("exact_users")) / F.col("exact_users")
    return (
        daily_est.join(exact, "day")
        .select(
            "day",
            "n_hours",
            "exact_users",
            (rel_err <= 0.05).alias("est_within_5pct"),
        )
    )


FUNC_SKETCH_ROLLUP_SQL = """\
WITH hourly AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         hour(ts) AS hr
  FROM events GROUP BY 1, 2)
SELECT h.day,
       COUNT(*) AS n_hours,
       e.exact_users,
       TRUE AS est_within_5pct
FROM hourly h
JOIN (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY 1) e USING (day)
GROUP BY h.day, e.exact_users"""


register("func_sketch_rollup", func_sketch_rollup, FUNC_SKETCH_ROLLUP_SQL)



# ---------------------------------------------------------------------------
# func_quantile_rollup — the quantile analogue of func_sketch_rollup:
# percentiles don't re-roll (a day's p90 is not derivable from hourly p90s),
# but an equi-width HISTOGRAM merges losslessly — hourly (day, hr, bucket,
# cnt) rows sum into the daily histogram, and any percentile is answered
# from the merged tier by cumulative-rank lookup with a provable ±bucket
# error bound.  At 100 TB only the hourly tier scans facts; daily (and any
# coarser) percentiles are bucket-count merges, bytes per group.
#
# Contract (same shape as the HLL rollup): hash-matched columns are the day,
# the exact disc-percentile (rank ceil(p·n), the proven func_percentile_disc
# formulation), the histogram bucket's [lo, hi] answer interval, and the
# boolean pinning the exact value inside it — a wrong cumulative-rank lookup
# flips the boolean/interval and the hash.  Buckets are exact integer math
# on 1e-2 fixed-point values; both engines TRUNCATE integer division toward
# zero (Spark `DIV` and DuckDB `//` agree at any sign: -501 // 500 = -1 in
# both), so the plain `v DIV W` bucket hash-matches even if a future fixture
# ships negative values.
# ---------------------------------------------------------------------------

QR_W = 500  # bucket width in 1e-2 units (5.00) → ≤ ±2.5 absolute error
_QR_PCTS = [(1, 2, "p50"), (9, 10, "p90")]


def func_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, "events", sf_dir).select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        "event_id",
    )
    hourly = e.groupBy(
        "day", "hr", F.expr(f"v DIV {QR_W}").alias("bkt")
    ).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    daily = hourly.groupBy("day", "bkt").agg(F.sum("cnt").alias("cnt"))
    wcum = W.partitionBy("day").orderBy("bkt").rowsBetween(W.unboundedPreceding, 0)
    hist = daily.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(W.partitionBy("day"))
    )
    picks = [F.max("n").alias("n_events")]
    for num, den, lbl in _QR_PCTS:
        target = F.expr(f"({num} * n + {den} - 1) DIV {den}")
        picks.append(
            F.min(F.when(F.col("cum") >= target, F.col("bkt"))).alias(f"__b_{lbl}")
        )
    hsel = hist.groupBy("day").agg(*picks)

    we = W.partitionBy("day").orderBy(F.asc("v"), F.asc("event_id"))
    ranked = e.select(
        "day",
        "v",
        F.row_number().over(we).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("day")).alias("n"),
    )
    eaggs = []
    for num, den, lbl in _QR_PCTS:
        target = F.expr(f"({num} * n + {den} - 1) DIV {den}")
        eaggs.append(
            F.min(F.when(F.col("rk") == target, F.col("v"))).alias(f"{lbl}_exact_e2")
        )
    exact = ranked.groupBy("day").agg(*eaggs)

    cols = ["day", "n_events"]
    for _num, _den, lbl in _QR_PCTS:
        lo = F.col(f"__b_{lbl}") * QR_W
        hi = lo + (QR_W - 1)
        cols += [
            F.col(f"{lbl}_exact_e2"),
            lo.alias(f"{lbl}_lo_e2"),
            hi.alias(f"{lbl}_hi_e2"),
            F.col(f"{lbl}_exact_e2").between(lo, hi).alias(f"{lbl}_in_bucket"),
        ]
    return hsel.join(exact, "day").select(*cols)


def _quantile_rollup_sql() -> str:
    hcols, ecols, ocols = [], [], []
    for num, den, lbl in _QR_PCTS:
        hcols.append(
            f"MIN(CASE WHEN cum >= ({num} * n + {den} - 1) // {den} "
            f"THEN bkt END) AS b_{lbl}"
        )
        ecols.append(
            f"MIN(CASE WHEN rk = ({num} * n + {den} - 1) // {den} "
            f"THEN v END) AS {lbl}_exact_e2"
        )
        ocols.append(
            f"e.{lbl}_exact_e2,\n"
            f"       b_{lbl} * {QR_W} AS {lbl}_lo_e2,\n"
            f"       b_{lbl} * {QR_W} + {QR_W - 1} AS {lbl}_hi_e2,\n"
            f"       e.{lbl}_exact_e2 BETWEEN b_{lbl} * {QR_W} "
            f"AND b_{lbl} * {QR_W} + {QR_W - 1} AS {lbl}_in_bucket"
        )
    return f"""\
WITH e AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         hour(ts) AS hr,
         CAST(FLOOR(value * 100) AS BIGINT) AS v,
         event_id
  FROM events),
hourly AS (
  SELECT day, hr, v // {QR_W} AS bkt, COUNT(*) AS cnt FROM e GROUP BY 1, 2, 3),
daily AS (
  SELECT day, bkt, CAST(SUM(cnt) AS BIGINT) AS cnt FROM hourly GROUP BY 1, 2),
hist AS (
  SELECT day, bkt, cnt,
         SUM(cnt) OVER (PARTITION BY day ORDER BY bkt
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY day) AS n
  FROM daily),
hsel AS (
  SELECT day, CAST(MAX(n) AS BIGINT) AS n_events,
         {(',' + chr(10) + '         ').join(hcols)}
  FROM hist GROUP BY day),
ranked AS (
  SELECT day, v,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY v, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY day) AS n
  FROM e),
exact AS (
  SELECT day,
         {(',' + chr(10) + '         ').join(ecols)}
  FROM ranked GROUP BY day)
SELECT h.day, h.n_events,
       {(',' + chr(10) + '       ').join(ocols)}
FROM hsel h JOIN exact e USING (day)"""


register("func_quantile_rollup", func_quantile_rollup, _quantile_rollup_sql())


# ---------------------------------------------------------------------------
# func_bitmap_rollup — the EXACT member of the mergeable-rollup family
# (HLL rollup ≈ NDV with an envelope; quantile rollup = percentile with a
# bucket envelope; THIS tier is exact): hourly 64-key-block user bitmaps
# (one BIGINT word per block, the prefilter.py encoding) OR-merge into the
# daily tier losslessly, and the daily distinct count is Σ popcount(word).
# Distinct counts don't re-roll, bitmaps do — the roaring-bitmap warehouse
# pattern in its flat-word form.  At 100 TB only the hourly tier scans
# facts; the daily merge moves (day × blocks) words, bytes per group.
# The DuckDB oracle computes the same numbers as a direct per-day
# COUNT(DISTINCT) — a deliberately different formulation, so agreement
# proves the bitmap algebra (a dropped OR or a mis-shifted bit changes the
# count).
# ---------------------------------------------------------------------------


def func_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .prefilter import bitmap_blk_bit

    e = load_table(spark, "events", sf_dir)
    blk, bit = bitmap_blk_bit("user_id")
    hourly = (
        e.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            F.hour("ts").alias("hr"),
            blk.alias("__blk"),
            bit.alias("__bit"),
        )
        .groupBy("day", "hr", "__blk")
        .agg(F.bit_or("__bit").alias("__word"))
    )
    daily_words = hourly.groupBy("day", "__blk").agg(
        F.bit_or("__word").alias("__word"),
    )
    n_hours = hourly.select("day", "hr").distinct().groupBy("day").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    daily = daily_words.groupBy("day").agg(
        F.sum(F.bit_count("__word")).cast("bigint").alias("n_users")
    )
    return daily.join(n_hours, "day").select("day", "n_hours", "n_users")


FUNC_BITMAP_ROLLUP_SQL = """\
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT hour(ts)) AS BIGINT) AS n_hours,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1"""


register("func_bitmap_rollup", func_bitmap_rollup, FUNC_BITMAP_ROLLUP_SQL)


# ---------------------------------------------------------------------------
# func_countmin_sketch — a COUNT-MIN sketch built RELATIONALLY (the same
# derandomized-md5 discipline as pipe_bloom_decontaminate's relational Bloom
# filter): K=4 hash rows × W=1024 buckets, position h_k(u) = 32 bits of
# md5('cms'||k||':'||u) mod W, counts from one fan-out-K hash aggregate.
# Because BOTH engines derive identical positions, the sketch — and every
# estimate read from it, overcounts included — is deterministic and fully
# hash-compared; the count-min guarantee (est ≥ true, overestimate bounded
# by collisions) is asserted from the data in tests, not assumed.
# Reported: the top-10 heaviest users' true counts beside their sketch
# estimates (est = MIN over the K rows).  Scale shape: the sketch is K×W =
# 4,096 rows REGARDLESS of corpus size (mergeable across shards by adding
# counts — the streaming/tiered-rollup property), the build is one map-side
# fan-out + hash aggregate, and probes join against the broadcast sketch.
# ---------------------------------------------------------------------------

CMS_K = 4
CMS_W = 1024
CMS_TOP = 10


def _cms_bucket(k_col, user_col) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        k_col.cast("string"),
                        F.lit(":"),
                        user_col.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_W
    )


def func_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).select("user_id")
    pos = e.select(
        "user_id",
        F.explode(F.array(*[F.lit(k) for k in range(CMS_K)])).alias("k"),
    ).select("k", _cms_bucket(F.col("k"), F.col("user_id")).alias("b"))
    sketch = pos.groupBy("k", "b").agg(F.count(F.lit(1)).alias("cnt"))
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(CMS_TOP)
    )
    probes = top.select(
        "user_id",
        "true_n",
        F.explode(F.array(*[F.lit(k) for k in range(CMS_K)])).alias("k"),
    ).withColumn("b", _cms_bucket(F.col("k"), F.col("user_id")))
    est = (
        probes.join(F.broadcast(sketch), ["k", "b"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.select(
        "user_id",
        "true_n",
        "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overcount_n"),
    )


FUNC_COUNTMIN_SKETCH_SQL = f"""\
WITH pos AS (
  SELECT k.k AS k,
         ('0x' || substr(md5('cms' || k.k || ':' || user_id), 1, 8))::BIGINT
           % {CMS_W} AS b
  FROM events CROSS JOIN range(0, {CMS_K}) k(k)),
sketch AS (SELECT k, b, COUNT(*) AS cnt FROM pos GROUP BY k, b),
top AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY user_id
  ORDER BY true_n DESC, user_id LIMIT {CMS_TOP}),
est AS (
  SELECT t.user_id, t.true_n, MIN(s.cnt) AS est_n
  FROM top t
  CROSS JOIN range(0, {CMS_K}) k(k)
  JOIN sketch s
    ON s.k = k.k
   AND s.b = ('0x' || substr(md5('cms' || k.k || ':' || t.user_id), 1, 8))::BIGINT
              % {CMS_W}
  GROUP BY t.user_id, t.true_n)
SELECT user_id, true_n, CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - true_n AS BIGINT) AS overcount_n
FROM est"""


register("func_countmin_sketch", func_countmin_sketch, FUNC_COUNTMIN_SKETCH_SQL)
