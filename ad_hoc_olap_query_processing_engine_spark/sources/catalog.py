"""Table registry: parquet dirs → temp views, plus the `sales` fixture view.

The reference's only relation is ``sales(cust, prod, day, month, year, state,
quant)`` read fully from PostgreSQL with no pushdown (reference:
src/QueryProcessor1.java:76-96). We derive an equivalent relation from the
driver's TPC-H-ish parquet tables (FIXTURES.md §1 fallback view) so that the
reference's golden queries run verbatim: fifteen supplier nations are mapped
onto the literal states 'NY'/'CT'/'NJ' used by the golden predicates (state
comes from the *supplier's* nation so it varies within a customer — deriving
it from the customer's nation would make per-cust-per-state aggregates
degenerate), and year 1997 exists natively in ``o_orderdate``.

Everything is a temp view over parquet — scans get column pruning and
predicate pushdown from Catalyst for free, and the derivation join keeps the
dimension sides (customer/nation/part) broadcastable at any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ANSI SQL, runnable by both Spark and DuckDB (the DuckDB oracle inlines this
# as a CTE — see phi/sqlgen.py). Casts pin int widths so Spark and DuckDB
# schemas agree (DuckDB's month() returns BIGINT, Spark's returns INT).
SALES_VIEW_SQL = """\
SELECT c.c_name                                    AS cust,
       p.p_brand                                   AS prod,
       CAST(day(o.o_orderdate)   AS INT)           AS day,
       CAST(month(o.o_orderdate) AS INT)           AS month,
       CAST(year(o.o_orderdate)  AS INT)           AS year,
       CASE WHEN n.n_name IN ('NATION_0','NATION_5','NATION_10','NATION_15','NATION_20')
                 THEN 'NY'
            WHEN n.n_name IN ('NATION_1','NATION_6','NATION_11','NATION_16','NATION_21')
                 THEN 'CT'
            WHEN n.n_name IN ('NATION_2','NATION_7','NATION_12','NATION_17','NATION_22')
                 THEN 'NJ'
            ELSE n.n_name END                      AS state,
       CAST(l.l_quantity AS INT)                   AS quant
FROM lineitem l
JOIN orders   o ON l.l_orderkey  = o.o_orderkey
JOIN customer c ON o.o_custkey   = c.c_custkey
JOIN supplier su ON l.l_suppkey  = su.s_suppkey
JOIN nation   n ON su.s_nationkey = n.n_nationkey
JOIN part     p ON l.l_partkey   = p.p_partkey"""

SALES_COLUMNS = ("cust", "prod", "day", "month", "year", "state", "quant")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot map
    natively. With ``spark.sql.legacy.parquet.nanosAsLong`` they surface as
    int64 epoch-nanos; we rebuild micros timestamps (matching how DuckDB —
    the oracle engine — coerces nanos to its micros TIMESTAMP)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:  # directory datasets / missing pyarrow: assume none
        return []


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one driver table, normalizing nanos timestamps to TimestampType."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # runtime-settable; required even on externally-built sessions (the
        # driver hands us a vanilla SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos_cols:
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every driver parquet table in ``sf_dir`` as a temp view."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def register_sales_view(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register base tables plus the derived ``sales`` view."""
    register_tables(spark, sf_dir)
    spark.sql(f"CREATE OR REPLACE TEMP VIEW sales AS {SALES_VIEW_SQL}")


def table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one driver table directly (no view registration side effects)."""
    return load_table(spark, name, sf_dir)


def sales_df(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """The ``sales`` relation as a DataFrame (registers the views)."""
    register_sales_view(spark, sf_dir)
    return spark.table("sales")
