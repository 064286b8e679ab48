"""Deep multi-join OLAP report shapes (TPC-H-inspired; SURVEY.md §2.3 row 1).

The reference engine answers only single-table Phi scans over `sales`
(/root/reference/src/QueryProcessor1.java:76-315 — one JDBC relation, no
joins); a user replacing it with this repo also gets the classic warehouse
report shapes those same tables support. Each query here is a well-known
TPC-H pattern adapted to the driver schema (no partsupp table; supplier
attribution rides lineitem.l_suppkey):

- rel_market_share       — Q8: share-of-total via conditional aggregation
- rel_volume_shipping    — Q7: nation-pair trade flows, symmetric filter
- rel_returned_items     — Q10: lost-revenue ranking, top-k after 4-way join
- rel_large_volume_orders— Q18: HAVING-derived key set joined back to facts
- rel_promo_revenue      — Q14: ratio metric per month with broadcast dim
- rel_mode_median        — exact per-group mode (deterministic tie-break)
  and interpolated median
- rel_gaps_islands       — consecutive-day streak detection (row_number
  difference trick), longest island per user
- rel_decile_spend       — ntile decile assignment re-aggregated into a
  per-decile profile

Scale notes (100 TB framing): every query joins facts on their natural keys
(lineitem⋈orders on orderkey never needs a re-partition beyond the join
shuffle, and AQE handles skew); all dimension tables (nation, region, part
at 0.2% of lineitem, customer aggregates post-reduction) are broadcast
explicitly where small, left to AQE where borderline. Ratio metrics divide
DOUBLE by DOUBLE after exact DECIMAL sums so results are order-independent
and bit-identical to the DuckDB oracle. Mode uses count + row_number with a
value tie-break instead of Spark's `mode()` (non-deterministic on ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from .relational import _dec, _dsum

_REV = "__rev"


def _with_revenue(l: DataFrame) -> DataFrame:
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return l.withColumn(_REV, rev)


# ---------------------------------------------------------------------------
# rel_market_share — TPC-H Q8 shape: one nation's supplier share of a
# region's market per year.  Share-of-total inside one aggregate (conditional
# sum / total sum), so the whole report is a single shuffle over the joined
# facts; nation and region are broadcast.
# ---------------------------------------------------------------------------


def rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _with_revenue(load_table(spark, "lineitem", sf_dir))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n_cust = load_table(spark, "nation", sf_dir).alias("cn")
    n_supp = load_table(spark, "nation", sf_dir).alias("sn")
    r = load_table(spark, "region", sf_dir)

    asia_nations = F.broadcast(
        n_cust.join(F.broadcast(r), F.col("cn.n_regionkey") == r.r_regionkey)
        .filter(r.r_name == "ASIA")
        .select(F.col("cn.n_nationkey").alias("cust_nationkey"))
    )
    nation_rev = F.when(F.col("sn.n_name") == "NATION_7", F.col(_REV)).otherwise(
        F.lit(0).cast("decimal(23,4)")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(asia_nations, c.c_nationkey == F.col("cust_nationkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn.n_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.sum(nation_rev).cast("double").alias("nation_rev"),
            F.sum(_REV).cast("double").alias("total_rev"),
        )
        .select(
            "order_year",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
            "total_rev",
        )
    )


REL_MARKET_SHARE_SQL = """\
WITH joined AS (
  SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         sn.n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                     ELSE CAST(0 AS DECIMAL(23,4)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE)          AS mkt_share,
       CAST(SUM(rev) AS DOUBLE)              AS total_rev
FROM joined
GROUP BY order_year"""


# ---------------------------------------------------------------------------
# rel_volume_shipping — TPC-H Q7 shape: trade volume between two nations in
# both directions.  The symmetric pair filter is pushed into the joined frame
# once; supp/cust nation are two broadcast copies of the same dim.
# ---------------------------------------------------------------------------


def rel_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _with_revenue(load_table(spark, "lineitem", sf_dir))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n_cust = load_table(spark, "nation", sf_dir).alias("cn")
    n_supp = load_table(spark, "nation", sf_dir).alias("sn")
    pair = (
        (F.col("sn.n_name") == "NATION_3") & (F.col("cn.n_name") == "NATION_9")
    ) | ((F.col("sn.n_name") == "NATION_9") & (F.col("cn.n_name") == "NATION_3"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(_REV).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


REL_VOLUME_SHIPPING_SQL = """\
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE)               AS revenue,
       COUNT(*)                      AS n_lines
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_9')
   OR (sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_3')
GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS INT)"""


# ---------------------------------------------------------------------------
# rel_returned_items — TPC-H Q10 shape: revenue lost to returns per customer,
# top 20.  Filter (l_returnflag = 'R') sits on the scan (pushdown); the final
# top-20 is TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------


def rel_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _with_revenue(load_table(spark, "lineitem", sf_dir))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_REV).cast("double").alias("lost_revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


REL_RETURNED_ITEMS_SQL = """\
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE)               AS lost_revenue,
       COUNT(*)                      AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20"""


# ---------------------------------------------------------------------------
# rel_large_volume_orders — TPC-H Q18 shape: qualify order keys with a
# HAVING aggregate, then join the (small) qualified key set back to
# orders⋈customer.  The qualified set is broadcast — at 100 TB the HAVING
# threshold keeps it tiny regardless of fact size.
# ---------------------------------------------------------------------------


def rel_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("int")).cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_total"),
            "total_qty",
        )
    )


REL_LARGE_VOLUME_ORDERS_SQL = """\
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS INT)) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_total, total_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey"""


# ---------------------------------------------------------------------------
# rel_promo_revenue — TPC-H Q14 shape: promo share of revenue per month.
# part is broadcast (0.2% of lineitem rows); the ratio divides two DOUBLEs
# produced from exact DECIMAL sums.
# ---------------------------------------------------------------------------


def rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _with_revenue(load_table(spark, "lineitem", sf_dir))
    p = load_table(spark, "part", sf_dir)
    promo = F.when(p.p_type == "PROMO", F.col(_REV)).otherwise(F.lit(0).cast("decimal(23,4)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("ship_month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_rev"),
            F.sum(_REV).cast("double").alias("total_rev"),
        )
        .select(
            "ship_month",
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
            "total_rev",
        )
    )


REL_PROMO_REVENUE_SQL = """\
WITH joined AS (
  SELECT CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS ship_month,
         p_type,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT ship_month,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                             ELSE CAST(0 AS DECIMAL(23,4)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE)   AS promo_pct,
       CAST(SUM(rev) AS DOUBLE)           AS total_rev
FROM joined
GROUP BY ship_month"""


# ---------------------------------------------------------------------------
# rel_mode_median — exact per-group mode and median.  Spark's mode() is
# non-deterministic on ties, so mode is computed as count + row_number with a
# lowest-value tie-break (same rule spelled out in the oracle); median uses
# the built-in exact interpolated percentile.
# ---------------------------------------------------------------------------


def rel_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    counts = l.groupBy("l_returnflag", "qty").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("qty"))
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"))
    )
    med = l.groupBy("l_returnflag").agg(
        F.percentile("price", 0.5).alias("median_price"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return med.join(F.broadcast(mode), "l_returnflag").select(
        "l_returnflag", "mode_qty", "median_price", "n_lines"
    )


REL_MODE_MEDIAN_SQL = """\
WITH typed AS (
  SELECT l_returnflag, CAST(l_quantity AS INT) AS qty,
         CAST(l_extendedprice AS DOUBLE) AS price
  FROM lineitem
),
mode AS (
  SELECT l_returnflag, qty AS mode_qty
  FROM (SELECT l_returnflag, qty, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, qty ASC) AS rn
        FROM typed GROUP BY l_returnflag, qty)
  WHERE rn = 1
)
SELECT t.l_returnflag, mode_qty,
       quantile_cont(price, 0.5) AS median_price,
       COUNT(*)                  AS n_lines
FROM typed t JOIN mode USING (l_returnflag)
GROUP BY t.l_returnflag, mode_qty"""


# ---------------------------------------------------------------------------
# rel_gaps_islands — longest consecutive-day activity streak per user (the
# classic islands query: date - row_number() is constant within an island).
# Everything stays partitioned by user; no global window.
# ---------------------------------------------------------------------------


def rel_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    days = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
    )
    best = W.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


REL_GAPS_ISLANDS_SQL = """\
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS streak_days,
         CAST(MIN(day) AS VARCHAR) AS streak_start
  FROM islands GROUP BY user_id, grp
)
SELECT user_id, streak_days, streak_start
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY streak_days DESC, streak_start ASC) AS rn
      FROM streaks)
WHERE rn = 1"""


# ---------------------------------------------------------------------------
# rel_decile_spend — ntile(10) decile assignment over per-customer spend,
# re-aggregated into a decile profile.  Deciles are a total ranking, but the
# plan contains NO unpartitioned window: customers bucket by spend VALUE
# RANGE (width_bucket over a broadcast min/max, so bucket order == spend
# order), rank locally within each bucket, and a broadcast per-bucket offset
# (sum of higher-bucket sizes, a SPEND_BUCKETS-row triangular join) turns
# local ranks into the exact global rank — the same rank-within-bucket +
# offset pattern as text_vocab, aligned by value range instead of hash
# because rank order matters here.  The ntile bucket then falls out of
# (rank, total) arithmetically.  At 100 TB the only data-sized shuffles are
# the per-customer aggregate and the bucketed window; everything global is
# constant-bounded.
# ---------------------------------------------------------------------------

SPEND_BUCKETS = 32


def rel_decile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    spend = o.groupBy("o_custkey").agg(_dsum("o_totalprice").alias("spend"))
    bounds = spend.agg(
        F.min("spend").alias("__lo"),
        F.max("spend").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    b = spend.crossJoin(F.broadcast(bounds)).withColumn(
        "__bkt",
        F.width_bucket(
            F.col("spend"), F.col("__lo"), F.col("__hi") + F.lit(1.0), SPEND_BUCKETS
        ),
    )
    rk_local = F.row_number().over(
        W.partitionBy("__bkt").orderBy(F.desc("spend"), F.asc("o_custkey"))
    )
    sizes = b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__sz"))
    higher = sizes.select(F.col("__bkt").alias("__hb"), F.col("__sz").alias("__hsz"))
    offsets = (
        sizes.join(F.broadcast(higher), F.col("__hb") > F.col("__bkt"), "left")
        .groupBy("__bkt")
        .agg(F.coalesce(F.sum("__hsz"), F.lit(0)).alias("__off"))
    )
    ranked = (
        b.withColumn("__rk", rk_local)
        .join(F.broadcast(offsets), "__bkt")
        .withColumn("__grk", F.col("__off") + F.col("__rk"))
    )
    # NTILE(10) from the global rank: the first (n % 10) tiles hold
    # floor(n/10)+1 rows, the rest floor(n/10)
    q = (F.col("__n") / 10).cast("bigint")
    r = F.col("__n") % 10
    big_span = r * (q + 1)
    decile = F.when(
        F.col("__grk") <= big_span, ((F.col("__grk") - 1) / (q + 1)).cast("bigint") + 1
    ).otherwise(r + ((F.col("__grk") - big_span - 1) / F.greatest(q, F.lit(1))).cast("bigint") + 1)
    return (
        ranked.withColumn("decile", decile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("spend")).cast("double").alias("decile_spend"),
            F.min("spend").alias("min_spend"),
            F.max("spend").alias("max_spend"),
        )
    )


REL_DECILE_SPEND_SQL = """\
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *, NTILE(10) OVER (ORDER BY spend DESC, o_custkey ASC) AS decile
  FROM spend
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS decile_spend,
       MIN(spend) AS min_spend, MAX(spend) AS max_spend
FROM ranked GROUP BY decile"""


register("rel_market_share", rel_market_share, REL_MARKET_SHARE_SQL)
register("rel_volume_shipping", rel_volume_shipping, REL_VOLUME_SHIPPING_SQL)
register("rel_returned_items", rel_returned_items, REL_RETURNED_ITEMS_SQL)
register("rel_large_volume_orders", rel_large_volume_orders, REL_LARGE_VOLUME_ORDERS_SQL)
register("rel_promo_revenue", rel_promo_revenue, REL_PROMO_REVENUE_SQL)
register("rel_mode_median", rel_mode_median, REL_MODE_MEDIAN_SQL)
register("rel_gaps_islands", rel_gaps_islands, REL_GAPS_ISLANDS_SQL)
register("rel_decile_spend", rel_decile_spend, REL_DECILE_SPEND_SQL)


# ---------------------------------------------------------------------------
# rel_share_of_parent — the hierarchical share report every OLAP frontend
# renders next to a rollup: revenue per region → nation → customer-segment
# leaf, each level carrying its share OF ITS PARENT in exact basis points.
# One aggregate at the leaf grain; every parent total is a window SUM over
# the (tiny) aggregate — never a second fact pass, never a self-join of the
# rollup.  Shares are (child·10⁴) DIV parent on scale-4 fixed-point integer
# revenue (both engines truncate non-negative integer division
# identically), so the whole report hash-matches bit-for-bit — the
# float-ratio formulation every BI tool uses could not.
# ---------------------------------------------------------------------------


def rel_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _with_revenue(load_table(spark, "lineitem", sf_dir))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    leaf = (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name", "c_mktsegment")
        .agg((F.sum(_REV) * 10000).cast("bigint").alias("rev_e4"))
    )
    # every share is INTEGER division (DIV // on non-negative fixed-point) —
    # a double division + cast would round differently past 2^53.  The
    # child·10⁴ multiply is widened to DECIMAL(38,0) BEFORE multiplying:
    # global rev_e4 is ~2.2e15·sf, so rev_e4·10⁴ overflows int64 at sf≥0.5 —
    # this runtime is ANSI-on Spark 4.x, where the un-widened form raises
    # ARITHMETIC_OVERFLOW (non-ANSI Spark would wrap silently; DuckDB raises
    # either way).  Spark's
    # integral DIV accepts decimal operands and returns BIGINT exactly, so
    # the report stays bit-exact at any scale factor.
    return leaf.select(
        "r_name",
        "n_name",
        "c_mktsegment",
        (F.col("rev_e4").cast("double") / 10000).alias("revenue"),
        F.expr(
            "CAST(CAST(rev_e4 AS DECIMAL(38,0)) * 10000 DIV SUM(rev_e4) OVER "
            "(PARTITION BY r_name, n_name) AS BIGINT)"
        ).alias("share_of_nation_bps"),
        F.expr(
            "CAST(CAST(SUM(rev_e4) OVER (PARTITION BY r_name, n_name) "
            "AS DECIMAL(38,0)) * 10000 "
            "DIV SUM(rev_e4) OVER (PARTITION BY r_name) AS BIGINT)"
        ).alias("nation_share_of_region_bps"),
        F.expr(
            "CAST(CAST(SUM(rev_e4) OVER (PARTITION BY r_name) "
            "AS DECIMAL(38,0)) * 10000 "
            "DIV SUM(rev_e4) OVER () AS BIGINT)"
        ).alias("region_share_of_total_bps"),
    )


REL_SHARE_OF_PARENT_SQL = """\
WITH leaf AS (
  SELECT r_name, n_name, c_mktsegment,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              * 10000 AS BIGINT) AS rev_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3)
SELECT r_name, n_name, c_mktsegment,
       CAST(rev_e4 AS DOUBLE) / 10000 AS revenue,
       CAST(CAST(rev_e4 AS HUGEINT) * 10000
            // SUM(rev_e4) OVER (PARTITION BY r_name, n_name)
            AS BIGINT) AS share_of_nation_bps,
       CAST(CAST(SUM(rev_e4) OVER (PARTITION BY r_name, n_name) AS HUGEINT)
            * 10000
            // SUM(rev_e4) OVER (PARTITION BY r_name) AS BIGINT)
         AS nation_share_of_region_bps,
       CAST(CAST(SUM(rev_e4) OVER (PARTITION BY r_name) AS HUGEINT) * 10000
            // SUM(rev_e4) OVER () AS BIGINT) AS region_share_of_total_bps
FROM leaf"""


register("rel_share_of_parent", rel_share_of_parent, REL_SHARE_OF_PARENT_SQL)


# ---------------------------------------------------------------------------
# rel_crosstab_chi2 — contingency table + chi-square independence statistic
# (is market segment independent of order priority?), entirely in exact
# fixed-point integers: per cell, expected mass = row·col/total and the χ²
# contribution (obs − exp)²/exp are computed on the common denominator
# (obs·total − row·col)² / (row·col·total), widened to DECIMAL(38,0) before
# squaring (obs·total crosses int64 around sf10) and emitted at 1e-6; the
# statistic is the windowed sum of per-cell contributions (identical
# per-cell truncation both engines ⇒ identical sum).  The data-QA /
# drift-detection primitive: a training pipeline runs this between corpus
# snapshots to flag distribution shift with a test statistic, not a
# hunch.  One fact pass + one broadcast dim join + one 25-cell aggregate.
# The oracle computes the same cells through HUGEINT (DuckDB's // on
# DECIMAL operands is plain division — the ts_autocorr finding — while
# integer // truncates like Spark's DIV).
# ---------------------------------------------------------------------------


def rel_crosstab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderpriority")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wr = W.partitionBy("c_mktsegment")
    wc = W.partitionBy("o_orderpriority")
    wall = W.partitionBy()
    t = (
        cells.withColumn("row_tot", F.sum("obs").over(wr))
        .withColumn("col_tot", F.sum("obs").over(wc))
        .withColumn("total", F.sum("obs").over(wall))
    )
    contrib = (
        "CAST(CAST(obs AS DECIMAL(38,0)) * total - CAST(row_tot AS DECIMAL(38,0)) * col_tot AS DECIMAL(38,0))"
    )
    t = t.withColumn(
        "exp_e4",
        F.expr(
            "CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 10000 DIV total AS BIGINT)"
        ),
    ).withColumn(
        "contrib_e6",
        F.expr(
            f"CAST({contrib} * {contrib} * 1000000 "
            "DIV (CAST(row_tot AS DECIMAL(38,0)) * col_tot * total) AS BIGINT)"
        ),
    )
    return t.select(
        "c_mktsegment",
        "o_orderpriority",
        "obs",
        "exp_e4",
        "contrib_e6",
        F.sum("contrib_e6").over(wall).alias("chi2_e6"),
    )


REL_CROSSTAB_CHI2_SQL = """\
WITH cells AS (
  SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS obs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
t AS (
  SELECT c_mktsegment, o_orderpriority, obs,
         CAST(SUM(obs) OVER (PARTITION BY c_mktsegment)    AS BIGINT) AS row_tot,
         CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS col_tot,
         CAST(SUM(obs) OVER ()                             AS BIGINT) AS total
  FROM cells),
x AS (
  SELECT c_mktsegment, o_orderpriority, obs,
         CAST(CAST(row_tot AS HUGEINT) * col_tot * 10000 // total AS BIGINT)
           AS exp_e4,
         CAST((CAST(obs AS HUGEINT) * total - CAST(row_tot AS HUGEINT) * col_tot)
              * (CAST(obs AS HUGEINT) * total - CAST(row_tot AS HUGEINT) * col_tot)
              * 1000000
              // (CAST(row_tot AS HUGEINT) * col_tot * total) AS BIGINT)
           AS contrib_e6
  FROM t)
SELECT c_mktsegment, o_orderpriority, obs, exp_e4, contrib_e6,
       CAST(SUM(contrib_e6) OVER () AS BIGINT) AS chi2_e6
FROM x"""


register("rel_crosstab_chi2", rel_crosstab_chi2, REL_CROSSTAB_CHI2_SQL)


# ---------------------------------------------------------------------------
# rel_skyline — Pareto-optimal frontier (skyline operator): the parts no
# other part dominates when maximizing p_size and minimizing price.  The
# textbook skyline is an all-pairs dominance test (O(n²)); the scale-safe
# Spark formulation exploits the 2-D special case: reduce to one candidate
# point per size (min price — anything dearer at the same size is dominated
# within the group), then a single ORDER BY size DESC running-min window
# proves a candidate undominated iff every strictly-larger size is strictly
# dearer.  One fact aggregation + one window over the per-size rollup whose
# row count is the DISTINCT SIZE cardinality (bounded ~50 by the dataset
# contract, independent of |part|) — the unpartitioned window runs on the
# reduced table, never the facts, so the plan survives 100 TB.  Prices are
# exact decimal cents.  The DuckDB oracle is the independent definitional
# form: quadratic NOT EXISTS dominance over the per-point rollup.
# Dominance is strict-in-at-least-one (q.size ≥ p.size ∧ q.price ≤ p.price
# ∧ (q.size > p.size ∨ q.price < p.price)), so exact duplicate points tie
# and survive together (reported once with n_at_point).
# ---------------------------------------------------------------------------


def rel_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load_table(spark, "part", sf_dir)
        .select(
            "p_size",
            (_dec("p_retailprice") * 100).cast("bigint").alias("price_c"),
        )
        .groupBy("p_size", "price_c")
        .agg(F.count(F.lit(1)).alias("n_at_point"))
    )
    best = pts.groupBy("p_size").agg(
        F.min("price_c").alias("best_price_c"),
        F.min_by("n_at_point", "price_c").alias("n_at_point"),
    )
    # Window over the ~50-row per-size rollup (NOT the fact table): min best
    # price among all strictly larger sizes; NULL frame = largest size.
    w = W.orderBy(F.col("p_size").desc()).rowsBetween(W.unboundedPreceding, -1)
    return (
        best.withColumn("min_price_larger", F.min("best_price_c").over(w))
        .where(
            F.col("min_price_larger").isNull()
            | (F.col("min_price_larger") > F.col("best_price_c"))
        )
        .select("p_size", F.col("best_price_c"), "n_at_point")
    )


REL_SKYLINE_SQL = """\
WITH pts AS (
  SELECT p_size,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
         COUNT(*) AS n_at_point
  FROM part GROUP BY 1, 2)
SELECT a.p_size, a.price_c AS best_price_c, a.n_at_point
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
    AND (b.p_size > a.p_size OR b.price_c < a.price_c))"""


register("rel_skyline", rel_skyline, REL_SKYLINE_SQL)


# ---------------------------------------------------------------------------
# rel_benford_check — first-digit (Benford) audit of order totals: the
# classic forensic data-quality screen for fabricated or truncated monetary
# columns.  Leading digit comes from the exact decimal-cents cast rendered
# as a string (no float log10 anywhere); the expected Benford mass
# log10(1+1/d) ships as integer 1e-5-scale literals (they sum to exactly
# 100000), observed shares use the shared truncating integer division
# (Spark DIV ≡ DuckDB // on integers), and the reported deviation is the
# absolute gap in the same 1e-5 fixed point.  One fact scan, one 9-row
# aggregate — nothing here grows with data size except the scan.  Synthetic
# uniform-ish prices will NOT follow Benford; the operator's job is to
# report the gap, and the oracle pins the arithmetic, not the verdict.
# ---------------------------------------------------------------------------

_BENFORD_E5 = {1: 30103, 2: 17609, 3: 12494, 4: 9691, 5: 7918,
               6: 6695, 7: 5799, 8: 5115, 9: 4576}


def rel_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    exp_map = F.create_map(
        *[F.lit(x) for kv in _BENFORD_E5.items() for x in kv]
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.substring((_dec("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    digits = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    t = digits.withColumn("total", F.sum("n_orders").over(W.partitionBy()))
    return t.select(
        "digit",
        "n_orders",
        F.expr("n_orders * 100000 DIV total").alias("obs_share_e5"),
        exp_map[F.col("digit")].alias("exp_share_e5"),
        F.abs(
            F.expr("n_orders * 100000 DIV total") - exp_map[F.col("digit")]
        ).alias("abs_dev_e5"),
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {v}" for d, v in _BENFORD_E5.items()
)

REL_BENFORD_CHECK_SQL = f"""\
WITH d AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders),
g AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
t AS (SELECT digit, n_orders, CAST(SUM(n_orders) OVER () AS BIGINT) AS total FROM g)
SELECT digit, n_orders,
       n_orders * 100000 // total AS obs_share_e5,
       CASE digit {_BENFORD_CASE} END AS exp_share_e5,
       abs(n_orders * 100000 // total - (CASE digit {_BENFORD_CASE} END))
         AS abs_dev_e5
FROM t"""


register("rel_benford_check", rel_benford_check, REL_BENFORD_CHECK_SQL)


# ---------------------------------------------------------------------------
# rel_hhi_concentration — Herfindahl–Hirschman index of supplier revenue
# concentration per nation: HHI = Σᵢ shareᵢ², the antitrust-standard
# concentration measure (10,000·HHI > 2,500 ⇒ "highly concentrated").
# Complements rel_gini_spend (inequality of a distribution) with the
# market-power lens (dominance of the top firms).  Exactness: summing
# per-term truncated shares would compound error, so the whole index is
# ONE integer rational — HHI_e8 = (Σ rᵢ²)·10⁸ DIV (Σ rᵢ)² — with rᵢ² and
# both products widened to DECIMAL(38,0).  Revenue is carried in 1e-4
# units (price·(1−disc) is a scale-4 decimal, so ×10⁴ is EXACT — a ×100
# residual-scale cast rounds in DuckDB but truncates in Spark, the
# rel_pareto_coverage idiom).  rᵢ reaches ~10¹¹ at sf1 so rᵢ² ≈ 10²²:
# int64-impossible, comfortable in 38 digits.  Plan: one fact pass → per
# (nation, supplier) rollup (broadcast dim joins) → per-nation aggregate;
# nothing after the first rollup grows with fact rows.
# ---------------------------------------------------------------------------


def rel_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    per = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg((F.sum(rev) * 10000).cast("bigint").alias("r_e4"))
    )
    return per.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("r_e4").alias("total_rev_e4"),
        F.expr(
            "CAST(SUM(CAST(r_e4 AS DECIMAL(38,0)) * r_e4) * 100000000 "
            "DIV (CAST(SUM(r_e4) AS DECIMAL(38,0)) * SUM(r_e4)) AS BIGINT)"
        ).alias("hhi_e8"),
    )


REL_HHI_CONCENTRATION_SQL = """\
WITH per AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              * 10000 AS BIGINT) AS r_e4
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, s.s_suppkey)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(r_e4) AS BIGINT) AS total_rev_e4,
       CAST(SUM(CAST(r_e4 AS HUGEINT) * r_e4) * 100000000
            // (CAST(SUM(r_e4) AS HUGEINT) * SUM(r_e4)) AS BIGINT) AS hhi_e8
FROM per GROUP BY n_name"""


register("rel_hhi_concentration", rel_hhi_concentration, REL_HHI_CONCENTRATION_SQL)
