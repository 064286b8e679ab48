"""Scalar-function surface op: one row per order exercising string, math,
date, and array functions whose semantics are identical in Spark and DuckDB
(so the whole expression surface is oracle-checked).

Functions deliberately excluded from the oracle because semantics differ
between engines (documented, not hidden): ``round`` on negative halves
(HALF_UP vs HALF_EVEN differences across engines/versions), regex flavor
corner cases (Java regex vs RE2), ``initcap`` word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register
from ..sources.catalog import load_table


def func_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.abs(F.col("o_totalprice") - F.lit(100000.0)).alias("price_dist"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_bucket"),
        F.year("o_orderdate").cast("int").alias("oy"),
        F.month("o_orderdate").cast("int").alias("om"),
        F.day("o_orderdate").cast("int").alias("od"),
        F.size(F.split("o_orderpriority", "-")).cast("int").alias("n_parts"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


FUNC_SCALAR_SURFACE_SQL = """\
SELECT o_orderkey,
       UPPER(SUBSTRING(o_orderpriority, 1, 3))             AS prio3,
       CAST(LENGTH(o_orderpriority) AS INT)                AS prio_len,
       o_orderstatus || '|' || o_orderpriority             AS tag,
       ABS(o_totalprice - 100000.0)                        AS price_dist,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT)          AS price_bucket,
       CAST(year(o_orderdate) AS INT)                      AS oy,
       CAST(month(o_orderdate) AS INT)                     AS om,
       CAST(day(o_orderdate) AS INT)                       AS od,
       CAST(len(string_split(o_orderpriority, '-')) AS INT) AS n_parts,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000  THEN 'mid'
            ELSE 'small' END                               AS size_class
FROM orders"""


register("func_scalar_surface", func_scalar_surface, FUNC_SCALAR_SURFACE_SQL)
