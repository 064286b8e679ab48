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

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

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
    """Read one driver table, normalizing every timestamp flavor to TIMESTAMP.

    Driver parquet has shipped ``ts`` as both ``timestamp[ns]`` (round 1) and
    ``timestamp[us]`` with no timezone (round 2+), which vanilla Spark reads
    as ``TIMESTAMP_NTZ`` — a type ``unix_micros`` and ``withWatermark``
    reject. We pin the session timezone to UTC (runtime-settable, works on
    externally-built sessions) and cast NTZ → TIMESTAMP; under UTC the cast
    is a pure metadata change (identical epoch micros), so results match
    DuckDB, which reads the same naive micros as its own TIMESTAMP.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # runtime-settable; required even on externally-built sessions (the
        # driver hands us a vanilla SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in nanos_cols:
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        # Deliberately a SESSION-level setting, not scoped to this read: the
        # whole engine's timestamp contract (and every DuckDB oracle) is
        # UTC-epoch semantics, and the driver hands us vanilla sessions this
        # function must make correct. A host app embedding this library with
        # its own non-UTC session timezone should pin UTC itself (our
        # session factory does) — mixing timezone conventions inside one
        # session is not a supported configuration.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast(TimestampType()) for c in ntz_cols})
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
    """The ``sales`` relation as a DataFrame.

    Default: the live 5-way derivation view (always correct, no state).
    With the :data:`SALES_CACHE_ENV` layout optimization enabled, reads the
    once-materialized year-partitioned parquet instead — same rows, but Φ
    queries skip the derivation join and WHERE year=... becomes partition
    pruning instead of a post-join filter.
    """
    if sales_cache_enabled():
        path = materialize_sales(spark, sf_dir)
        return spark.read.parquet(path).select(*SALES_COLUMNS)
    register_sales_view(spark, sf_dir)
    return spark.table("sales")


# ---------------------------------------------------------------------------
# Materialized `sales` layout (documented optimization, opt-in via env).
#
# The derivation view joins lineitem against 5 dimensions on every Φ query.
# A warehouse deployment would maintain `sales` as a materialized table laid
# out for the workload; this mirrors that: written ONCE per (sf_dir, data
# mtime) under the system temp dir, partitioned by `year` so the goldens'
# `{year}[==]{1997}` WHERE prunes whole partitions at the file listing level
# (at 100 TB: the same layout, partitioned by year on the object store, cuts
# each Φ scan to the years it touches). Correctness runs never enable this —
# the driver's vanilla sessions take the view path.
# ---------------------------------------------------------------------------

SALES_CACHE_ENV = "SPARK_GRAFT_SALES_CACHE"


def sales_cache_enabled() -> bool:
    return os.environ.get(SALES_CACHE_ENV, "").lower() in ("1", "true", "yes")


def _sales_cache_dir(sf_dir: str) -> str:
    """Cache key = sf_dir path + lineitem mtime: regenerated driver data gets
    a fresh materialization instead of silently reading a stale layout."""
    li = os.path.join(sf_dir, "lineitem.parquet")
    try:
        mtime = str(int(os.path.getmtime(li)))
    except OSError:
        mtime = "0"
    sig = hashlib.md5(f"{os.path.abspath(sf_dir)}:{mtime}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_sales_{sig}")


# ---------------------------------------------------------------------------
# Bucketed fact-table layout (co-located joins, the second documented layout
# optimization). Writing lineitem and orders bucketed AND sorted by the order
# key makes every orderkey-equi-join between them — and any orderkey groupBy
# downstream of it — shuffle-free: both scans report the same
# hashpartitioning, so Catalyst plans SortMergeJoin with ZERO Exchange. At
# 100 TB this is the difference between re-shuffling two fact tables per
# query and never shuffling them at all; bucket count there would be sized
# ~128 MB/bucket-file (thousands), 8 here so tiny SFs still fill buckets.
# Bucketed tables live in the session catalog (saveAsTable), so consumers
# fall back to the identical plain-parquet join when they're absent — same
# rows either way, which keeps the driver's vanilla-session correctness runs
# on the stateless path.
# ---------------------------------------------------------------------------

N_BUCKETS = 8
BUCKET_TABLES = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def bucketed_name(base: str, sf_dir: str) -> str:
    sig = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"{base}_bkt_{sig}"


def materialize_bucketed(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, str]:
    """Write the order-keyed fact tables bucketed+sorted by the join key,
    once per session (idempotent via tableExists). Returns base→table name."""
    names: dict[str, str] = {}
    for base, key in BUCKET_TABLES.items():
        name = bucketed_name(base, sf_dir)
        if not spark.catalog.tableExists(name):
            # the in-memory catalog forgets tables across sessions but the
            # warehouse directory survives; clear the stale location (it's a
            # derived cache) or saveAsTable raises LOCATION_ALREADY_EXISTS
            loc = os.path.join(
                spark.conf.get(
                    "spark.sql.warehouse.dir", "spark-warehouse"
                ).removeprefix("file:"),
                name,
            )
            if os.path.exists(loc):
                import shutil

                shutil.rmtree(loc, ignore_errors=True)
            (
                load_table(spark, base, sf_dir)
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        names[base] = name
    return names


def materialize_sales(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, cache_dir: str | None = None
) -> str:
    """Write the derived ``sales`` relation once as year-partitioned parquet;
    idempotent (keyed on the _SUCCESS marker). Returns the parquet path."""
    out = cache_dir or _sales_cache_dir(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        register_tables(spark, sf_dir)
        (
            spark.sql(SALES_VIEW_SQL)
            # cluster rows of one year into one task → one compact file per
            # partition dir (parquet row groups keep the read side splittable)
            .repartition("year")
            .write.mode("overwrite")
            .partitionBy("year")
            .parquet(out)
        )
    return out
