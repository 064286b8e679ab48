"""Exact-integer statistical test / inequality-metric operators.

The reference engine computes only sum/avg/min/max/count aggregates
(/root/reference/src/QueryProcessor1.java:113-302); a warehouse replacing
it also wants the DISTRIBUTIONAL questions those aggregates can't answer —
"did the metric's distribution shift?" (rank tests) and "how concentrated
is it?" (inequality indices).  Both operators here follow the repo's
fixed-point discipline: every statistic is exact integer arithmetic with
cleared denominators (DECIMAL(38,0) where products can cross int64), so
the DuckDB hash-compare is bit-exact and order-independent — no float
accumulation anywhere.

- rel_mann_whitney — Mann–Whitney U (Wilcoxon rank-sum) between two event
  populations, the standard nonparametric two-sample location test: does
  `purchase` draw from the same value distribution as `click`?  Doubled
  midranks make ties exact integers: for value v with c_lt smaller values
  and t ties, 2·midrank = 2·c_lt + t + 1.
- rel_gini_spend — Gini coefficient of customer order spend, the standard
  inequality index: G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-rank
  spend, emitted at 1e-6 fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# rel_mann_whitney — scale shape: ONE fact scan reduced to the DISTINCT
# QUANTIZED VALUE grain (≤ ~33k rows: the 1e-2 grid over the bounded value
# domain is a dataset contract, independent of row count), then one ordered
# window over that bounded rollup computes cumulative counts — the same
# bounded-domain window argument as rel_skyline's size rollup.  The U
# statistic is assembled from doubled midranks so ties never leave the
# integers.  Headroom: rank2 ≤ 2N+1 and R1_x2 ≤ N·(2N+1) stays inside
# int64 through sf1000 (N ≈ 4·10⁸).  The DuckDB oracle is the independent
# PER-ROW textbook form (2·RANK() + tie-count − 1) — same statistic, no
# shared rollup structure.
# ---------------------------------------------------------------------------

MW_A, MW_B = "click", "purchase"


def rel_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin(MW_A, MW_B))
        .select(
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
            (F.col("event_type") == MW_A).cast("bigint").alias("is_a"),
        )
    )
    per_v = e.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"), F.sum("is_a").alias("t_a")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_v.select(
        "t",
        "t_a",
        (
            2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + F.lit(1)
        ).alias("rank2"),
    )
    agg = ranked.agg(
        F.sum("t_a").alias("n1"),
        (F.sum("t") - F.sum("t_a")).alias("n2"),
        F.sum(F.col("t_a") * F.col("rank2")).alias("r1_x2"),
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1).alias("u2_x2"),
    )


REL_MANN_WHITNEY_SQL = f"""\
WITH s AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type IN ('{MW_A}', '{MW_B}')),
r AS (
  SELECT event_type,
         2 * CAST(RANK() OVER (ORDER BY v) AS BIGINT)
           + CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) - 1 AS rank2
  FROM s),
a AS (
  SELECT CAST(COUNT(*) FILTER (WHERE event_type = '{MW_A}') AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE event_type = '{MW_B}') AS BIGINT) AS n2,
         CAST(SUM(rank2) FILTER (WHERE event_type = '{MW_A}') AS BIGINT) AS r1_x2
  FROM r)
SELECT n1, n2,
       r1_x2 - n1 * (n1 + 1) AS u1_x2,
       2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2
FROM a"""


register("rel_mann_whitney", rel_mann_whitney, REL_MANN_WHITNEY_SQL)


# ---------------------------------------------------------------------------
# rel_gini_spend — scale shape: the customer-spend rollup gets its GLOBAL
# ascending rank with the partition-safe bucket-offset technique
# (rel_pareto_coverage / rel_decile_spend's pattern: width_bucket → local
# row_number per bucket → broadcast count offsets of all LOWER buckets), so
# no unpartitioned window ever sees the customer dimension.  Σ rank·spend
# is widened to DECIMAL(38,0) BEFORE the product (rank ≤ n and cents ≤ 5e7
# put the per-term product near 1e14 and the sf10 sum past int64 — the
# rel_share_of_parent overflow class), and the final Gini is one exact
# integer division emitted at 1e-6.  Equal spends make Σ rank·spend
# invariant to tie order, so the custkey tie-break is for determinism of
# the intermediate only.  Oracle = textbook single-window form in HUGEINT.
# ---------------------------------------------------------------------------

GINI_BUCKETS = 64


def rel_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("spend_c")
        )
    )
    bounds = per_cust.agg(
        F.min("spend_c").alias("__lo"),
        F.max("spend_c").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
        F.sum("spend_c").alias("__tot"),
    )
    b = per_cust.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.width_bucket(
            F.col("spend_c"), F.col("__lo"), F.col("__hi") + F.lit(1), GINI_BUCKETS
        ),
    )
    wb = W.partitionBy("__bkt").orderBy(F.asc("spend_c"), F.asc("o_custkey"))
    local = b.select(
        "__bkt", "__n", "__tot", "spend_c", F.row_number().over(wb).alias("__rk_l")
    )
    sizes = b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__sz"))
    lower = sizes.select(F.col("__bkt").alias("__lb"), F.col("__sz").alias("__lsz"))
    offsets = (
        sizes.join(F.broadcast(lower), F.col("__lb") < F.col("__bkt"), "left")
        .groupBy("__bkt")
        .agg(F.coalesce(F.sum("__lsz"), F.lit(0)).alias("__coff"))
    )
    ranked = local.join(F.broadcast(offsets), "__bkt").select(
        "__n",
        "__tot",
        (
            (F.col("__coff") + F.col("__rk_l")).cast("decimal(38,0)")
            * F.col("spend_c")
        ).alias("__rx"),
    )
    agg = ranked.agg(
        F.min("__n").alias("n_customers"),
        F.min("__tot").alias("total_spend_c"),
        F.sum("__rx").alias("__srx"),
    )
    gini = F.expr(
        "CAST((2 * __srx - (CAST(n_customers AS DECIMAL(38,0)) + 1) * total_spend_c)"
        " * 1000000 DIV (CAST(n_customers AS DECIMAL(38,0)) * total_spend_c)"
        " AS BIGINT)"
    )
    return agg.select("n_customers", "total_spend_c", gini.alias("gini_e6"))


REL_GINI_SPEND_SQL = """\
WITH pc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS spend_c
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT spend_c,
         CAST(ROW_NUMBER() OVER (ORDER BY spend_c, o_custkey) AS BIGINT) AS rk
  FROM pc),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(spend_c) AS BIGINT) AS total_spend_c,
         CAST(SUM(CAST(rk AS HUGEINT) * spend_c) AS HUGEINT) AS srx
  FROM r)
SELECT n_customers, total_spend_c,
       CAST((2 * srx - (CAST(n_customers AS HUGEINT) + 1) * total_spend_c)
            * 1000000 // (CAST(n_customers AS HUGEINT) * total_spend_c)
            AS BIGINT) AS gini_e6
FROM a"""


register("rel_gini_spend", rel_gini_spend, REL_GINI_SPEND_SQL)


# ---------------------------------------------------------------------------
# ts_runs_test — Wald–Wolfowitz runs test per user: is each user's event
# VALUE SEQUENCE random around the corpus median, or does it streak?
# (Complements rel_mann_whitney: that one tests WHERE two samples sit, this
# one tests the ORDERING within one sequence — the monitoring question
# "has this meter gone autocorrelated/stuck?".)  Dichotomize against the
# exact global disc-median (computed from the bounded quantized-value
# rollup, ties-at-median dropped per the textbook procedure), count runs
# with one LAG per user, then clear the z² statistic to exact integers:
# with N = n1+n2, A = R·N − 2·n1·n2 − N,
#   z² = A²·(N−1) / (2·n1·n2·(2·n1·n2 − N))
# — the classic mean/variance of the run count with every denominator
# multiplied through.  A² · (N−1) crosses int64 once per-user sequences
# reach ~1000 events, so the products are widened to DECIMAL(38,0).
# Degenerate users (all-above / all-below / too short: variance 0) are
# reported in n_users_skipped, not silently dropped.  The per-round plan
# is JVM windows + aggregates: median rollup (bounded domain) → broadcast
# scalar → one user_id window pass → per-user rollup → one-row report with
# the 5%-significance breach count (χ²₁ 95% = 3.841459 baked at 1e-6 in
# both engines).
# ---------------------------------------------------------------------------

_CHI2_95_E6 = 3841459


def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    # exact global disc-median: value at rank ceil(n/2) of the sorted
    # multiset, found by cumulative count over the bounded distinct-value
    # rollup (the rel_mann_whitney window argument)
    per_v = e.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    med = (
        per_v.select("v", F.sum("t").over(wv).alias("c"), F.sum("t").over(W.partitionBy()).alias("n"))
        .filter(2 * F.col("c") >= F.col("n"))
        .agg(F.min("v").alias("median_v"))
    )
    s = (
        e.crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("median_v"))
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("v") > F.col("median_v")).cast("int").alias("above"),
        )
    )
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = s.select(
        "user_id",
        "above",
        (F.col("above") != F.lag("above").over(wu)).cast("int").alias("chg"),
    ).groupBy("user_id").agg(
        (F.coalesce(F.sum("chg"), F.lit(0)) + 1).alias("r"),
        F.sum("above").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).alias("n2"),
    )
    big = "CAST({} AS DECIMAL(38,0))"
    a = f"({big.format('r')} * (n1 + n2) - 2 * {big.format('n1')} * n2 - (n1 + n2))"
    var2 = f"(2 * {big.format('n1')} * n2 * (2 * {big.format('n1')} * n2 - (n1 + n2)))"
    z2 = runs.select(
        F.expr(
            f"CASE WHEN n1 = 0 OR n2 = 0 OR {var2} <= 0 THEN NULL "
            f"ELSE CAST({a} * {a} * (n1 + n2 - 1) * 1000000 DIV {var2} AS BIGINT) END"
        ).alias("z2_e6")
    )
    return z2.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("z2_e6").alias("n_users_eval"),
        (F.count(F.lit(1)) - F.count("z2_e6")).alias("n_users_skipped"),
        F.count_if(F.col("z2_e6") > _CHI2_95_E6).alias("n_nonrandom_5pct"),
        F.coalesce(F.sum("z2_e6"), F.lit(0)).alias("sum_z2_e6"),
    )


TS_RUNS_TEST_SQL = f"""\
WITH e AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(value * 100) AS BIGINT) AS v
  FROM events),
m AS (
  SELECT MIN(v) AS median_v FROM (
    SELECT v,
           CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) AS c,
           CAST(SUM(t) OVER () AS BIGINT) AS n
    FROM (SELECT v, COUNT(*) AS t FROM e GROUP BY v))
  WHERE 2 * c >= n),
s AS (
  SELECT user_id, ts, event_id,
         CAST(v > (SELECT median_v FROM m) AS INT) AS above
  FROM e WHERE v <> (SELECT median_v FROM m)),
u AS (
  SELECT user_id,
         CAST(1 + COALESCE(SUM(chg), 0) AS BIGINT) AS r,
         CAST(SUM(above) AS BIGINT) AS n1,
         CAST(COUNT(*) - SUM(above) AS BIGINT) AS n2
  FROM (
    SELECT user_id, above,
           CAST(above <> LAG(above) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS INT) AS chg
    FROM s)
  GROUP BY user_id),
z AS (
  SELECT CASE WHEN n1 = 0 OR n2 = 0
                OR 2 * CAST(n1 AS HUGEINT) * n2 * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2)) <= 0
              THEN NULL
              ELSE CAST((CAST(r AS HUGEINT) * (n1 + n2) - 2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2))
                        * (CAST(r AS HUGEINT) * (n1 + n2) - 2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2))
                        * (n1 + n2 - 1) * 1000000
                        // (2 * CAST(n1 AS HUGEINT) * n2 * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2)))
                        AS BIGINT) END AS z2_e6
  FROM u)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(z2_e6) AS BIGINT) AS n_users_eval,
       CAST(COUNT(*) - COUNT(z2_e6) AS BIGINT) AS n_users_skipped,
       CAST(COUNT(*) FILTER (WHERE z2_e6 > {_CHI2_95_E6}) AS BIGINT) AS n_nonrandom_5pct,
       CAST(COALESCE(SUM(z2_e6), 0) AS BIGINT) AS sum_z2_e6
FROM z"""


register("ts_runs_test", ts_runs_test, TS_RUNS_TEST_SQL)
