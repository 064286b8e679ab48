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

