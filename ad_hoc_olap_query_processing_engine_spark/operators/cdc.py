"""Change-data-capture surface: snapshot diff and CDC batch apply (merge).

The reference engine reads one static JDBC snapshot per run
(reference: src/QueryProcessor1.java:76-96) — it has no notion of a table
changing between runs. Production corpora do: a crawl refresh adds, removes,
and rewrites documents; a dimension refresh rewrites rows. The two CDC
primitives every pipeline needs are

rel_snapshot_diff   old vs new snapshot → row-level (key, status) for
                    status ∈ added/removed/changed. FULL OUTER JOIN on the
                    key and compare an md5 ROW FINGERPRINT over the tracked
                    columns — one hash comparison regardless of column
                    count, the generic wide-table diff. One shuffle on the
                    key; at 100 TB both sides hash-partition on the key and
                    the fingerprint is computed map-side, so the exchanged
                    rows carry (key, 32-byte hash), not the full row.

rel_merge_upsert    apply a CDC batch (upserts + deletes) onto a base
                    snapshot — MERGE INTO semantics without a lakehouse
                    format: base LEFT ANTI touched-keys ∪ upserts. The
                    touched-key set scales with the batch, not the base, so
                    it broadcasts (explicit hint: it is derived from the
                    batch, which is small by definition in CDC). Output is
                    an aggregate profile of the merged state, which the
                    oracle recomputes through its own merge pipeline.

Both snapshots are derived deterministically from the driver's `orders`
parquet (modulo-key membership + a one-cent price rewrite) so the operators
run on real input data and stay hash-checkable.

Money is compared in exact integer cents (ROUND before the bigint cast —
Spark truncates doubles, DuckDB rounds; going through ROUND pins both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# deterministic snapshot derivation: old drops keys ≡4 (mod 5), new drops
# keys ≡6 (mod 7), and new rewrites the price of keys ≡0 (mod 3) by +1 cent —
# so the diff exercises added, removed, AND changed rows.
_OLD_DROP_MOD, _OLD_DROP_REM = 5, 4
_NEW_DROP_MOD, _NEW_DROP_REM = 7, 6
_CHG_MOD = 3


def _cents(col: str = "o_totalprice") -> Column:
    return F.round(F.col(col) * 100).cast("bigint")


def _old_snapshot(orders: DataFrame) -> DataFrame:
    return orders.filter(
        F.col("o_orderkey") % _OLD_DROP_MOD != _OLD_DROP_REM
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", _cents().alias("cents"))


def _new_snapshot(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % _NEW_DROP_MOD != _NEW_DROP_REM).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % _CHG_MOD == 0, _cents() + 1)
        .otherwise(_cents())
        .alias("cents"),
    )


def _fingerprint(df: DataFrame) -> DataFrame:
    """32-byte md5 row fingerprint over the tracked columns (md5 and the
    '|' join are bit-identical in Spark and DuckDB)."""
    return df.withColumn(
        "fp",
        F.md5(F.concat_ws("|", "o_orderstatus", "o_orderpriority", "cents")),
    )


_SNAPSHOT_CTES = f"""\
old AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % {_OLD_DROP_MOD} <> {_OLD_DROP_REM}),
new AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % {_CHG_MOD} = 0 THEN 1 ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % {_NEW_DROP_MOD} <> {_NEW_DROP_REM})"""

_FP = "md5(concat_ws('|', o_orderstatus, o_orderpriority, cents))"


def rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    old = _fingerprint(_old_snapshot(orders)).select(
        F.col("o_orderkey"), F.col("fp").alias("old_fp"), F.col("cents").alias("old_cents")
    )
    new = _fingerprint(_new_snapshot(orders)).select(
        F.col("o_orderkey"), F.col("fp").alias("new_fp"), F.col("cents").alias("new_cents")
    )
    j = old.join(new, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())  # unchanged rows drop out
        .select("o_orderkey", "status", "old_cents", "new_cents")
    )


REL_SNAPSHOT_DIFF_SQL = f"""\
WITH {_SNAPSHOT_CTES},
o AS (SELECT o_orderkey, {_FP} AS fp, cents FROM old),
n AS (SELECT o_orderkey, {_FP} AS fp, cents FROM new)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed' END AS status,
       o.cents AS old_cents,
       n.cents AS new_cents
FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
WHERE o.fp IS NULL OR n.fp IS NULL OR o.fp <> n.fp"""


def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the CDC batch (new-side rows of added/changed keys as upserts,
    removed keys as deletes) onto the old snapshot; profile the merged
    state. The merged state must equal the new snapshot — the oracle
    recomputes the same merge pipeline in SQL, so a bug in the anti-join /
    union mechanics (dropped deletes, duplicated upserts) breaks the hash."""
    orders = load_table(spark, "orders", sf_dir)
    old = _fingerprint(_old_snapshot(orders))
    new = _fingerprint(_new_snapshot(orders))
    old_k = old.select("o_orderkey", F.col("fp").alias("old_fp"))
    # the batch: every key whose fingerprint differs between snapshots
    upserts = new.join(old_k, "o_orderkey", "left").filter(
        F.col("old_fp").isNull() | (F.col("old_fp") != F.col("fp"))
    ).drop("old_fp")
    deletes = old.join(
        new.select("o_orderkey"), "o_orderkey", "left_anti"
    ).select("o_orderkey")
    # MERGE: base minus touched keys, plus the upserted rows. The touched
    # set is batch-sized (CDC batches ≪ base) → broadcast the anti side.
    touched = upserts.select("o_orderkey").unionByName(deletes)
    merged = old.join(
        F.broadcast(touched), "o_orderkey", "left_anti"
    ).unionByName(upserts)
    return merged.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


REL_MERGE_UPSERT_SQL = f"""\
WITH {_SNAPSHOT_CTES},
o AS (SELECT *, {_FP} AS fp FROM old),
n AS (SELECT *, {_FP} AS fp FROM new),
upserts AS (
  SELECT n.* FROM n LEFT JOIN o ON n.o_orderkey = o.o_orderkey
  WHERE o.fp IS NULL OR o.fp <> n.fp),
deletes AS (
  SELECT o.o_orderkey FROM o LEFT JOIN n ON o.o_orderkey = n.o_orderkey
  WHERE n.o_orderkey IS NULL),
touched AS (SELECT o_orderkey FROM upserts UNION ALL SELECT o_orderkey FROM deletes),
merged AS (
  SELECT * FROM o WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
  UNION ALL
  SELECT * FROM upserts)
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)                   AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       MIN(o_orderkey)            AS min_key,
       MAX(o_orderkey)            AS max_key
FROM merged
GROUP BY o_orderstatus, o_orderpriority"""


register("rel_snapshot_diff", rel_snapshot_diff, REL_SNAPSHOT_DIFF_SQL)
register("rel_merge_upsert", rel_merge_upsert, REL_MERGE_UPSERT_SQL)


# ---------------------------------------------------------------------------
# cdc_scd2_intervals — slowly-changing-dimension type-2 history build: turn
# an append-only change stream (events: each row = the entity's new state)
# into versioned validity intervals [valid_from, valid_to) with run-length
# collapse — a version row is written only when the state actually CHANGES,
# the canonical SCD2 contract (Kimball dimension modeling; Delta/Iceberg
# MERGE-based SCD2 pipelines build exactly this table). Two windows, both
# partitioned on user_id (numerous uniform keys — no hot partitions at any
# scale): lag() detects state changes, lead() closes each kept version's
# interval. The open (current) version closes at the SCD2 high-date sentinel
# (Kimball convention; 2200-01-01 here, inside pandas' datetime64[ns] range
# so cross-engine comparison stays unit-exact — a NULL valid_to would also
# hit the pandas ns-vs-µs NaT comparison quirk) with is_current carrying the
# open-interval flag. Deterministic order inside a user via the
# (ts, event_id) tiebreak.
# ---------------------------------------------------------------------------

SCD2_OPEN_END = "2200-01-01 00:00:00"


def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ev.withColumn("__prev", F.lag("event_type").over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type"))
    )
    nxt = F.lead("ts").over(w)
    return changed.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit(SCD2_OPEN_END).cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


CDC_SCD2_INTERVALS_SQL = f"""\
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
changed AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev IS NULL OR prev <> event_type)
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       event_type                       AS state,
       ts                               AS valid_from,
       COALESCE(LEAD(ts) OVER w,
                TIMESTAMP '{SCD2_OPEN_END}') AS valid_to,
       LEAD(ts) OVER w IS NULL          AS is_current
FROM changed
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


register("cdc_scd2_intervals", cdc_scd2_intervals, CDC_SCD2_INTERVALS_SQL)


# ---------------------------------------------------------------------------
# rel_pit_join — POINT-IN-TIME join against the SCD2 interval dimension:
# every purchase looks up the dimension version that was valid just before
# it happened (t = ts − 1 µs ⇒ valid_from < ts ≤ valid_to), the
# feature-store / ML-training correctness rule that prevents label leakage
# — joining "current" dimension values into historical facts trains on
# information from the future.  The intervals partition each user's
# timeline, so every probe matches at most one version (left join keeps
# first-ever purchases as 'none').  Join shape at 100 TB: equi on user_id
# with the interval predicate as a residual — per-user version counts are
# bounded by state changes, so the residual scan per key is tiny; no range
# explosion.  Oracle: the same interval CTE joined the same way.
# ---------------------------------------------------------------------------


def rel_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = cdc_scd2_intervals(spark, sf_dir).select(
        F.col("user_id").alias("iv_user"), "state", "valid_from", "valid_to"
    )
    p = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
    )
    joined = p.join(
        iv,
        (p.user_id == F.col("iv_user"))
        & (F.col("valid_from") < p.ts)
        & (p.ts <= F.col("valid_to")),
        "left",
    )
    return (
        joined.select(
            F.coalesce(F.col("state"), F.lit("none")).alias("prior_state"), "value"
        )
        .groupBy("prior_state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )


REL_PIT_JOIN_SQL = f"""\
WITH iv AS ({CDC_SCD2_INTERVALS_SQL})
SELECT COALESCE(iv.state, 'none') AS prior_state,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events p
LEFT JOIN iv ON iv.user_id = p.user_id
            AND iv.valid_from < p.ts AND p.ts <= iv.valid_to
WHERE p.event_type = 'purchase'
GROUP BY 1"""


register("rel_pit_join", rel_pit_join, REL_PIT_JOIN_SQL)


# ---------------------------------------------------------------------------
# cdc_changelog_apply — delete-aware changelog compaction: replaying an
# ordered change stream (here: events as upserts, with 'error' acting as
# the DELETE marker) must yield each key's LATEST surviving state, and keys
# whose final entry is a delete must vanish from the materialized table —
# the read-side contract of a CDC ingest (Debezium-style op streams)
# that rel_latest_event (upsert-only) and rel_merge_upsert (single batch)
# don't cover.  One struct-max per key (ts, event_id tie-break), then the
# tombstone filter; a single shuffle, mergeable across partitions, so the
# same plan applies a 100 TB backlog.  Aggregated to per-state counts +
# tombstone total so the result stays narrow.
# ---------------------------------------------------------------------------


def cdc_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    last = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type", "value")).alias("__last")
        )
        .select(
            "user_id",
            F.col("__last.event_type").alias("last_state"),
            F.col("__last.value").alias("last_value"),
        )
    )
    live = last.filter(F.col("last_state") != "error")
    dead = last.filter(F.col("last_state") == "error").agg(
        F.count(F.lit(1)).alias("__n_dead")
    )
    return (
        live.groupBy("last_state")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("last_value").cast("decimal(18,6)")).cast("double").alias(
                "sum_last_value"
            ),
        )
        .crossJoin(F.broadcast(dead))
        .select(
            "last_state",
            "n_users",
            "sum_last_value",
            F.col("__n_dead").alias("n_tombstoned"),
        )
    )


CDC_CHANGELOG_APPLY_SQL = """\
WITH ranked AS (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events),
last AS (SELECT user_id, event_type AS last_state, value AS last_value
         FROM ranked WHERE rk = 1),
dead AS (SELECT COUNT(*) AS n_dead FROM last WHERE last_state = 'error')
SELECT last_state,
       COUNT(*) AS n_users,
       CAST(SUM(CAST(last_value AS DECIMAL(18,6))) AS DOUBLE) AS sum_last_value,
       dead.n_dead AS n_tombstoned
FROM last CROSS JOIN dead
WHERE last_state <> 'error'
GROUP BY last_state, dead.n_dead"""


register("cdc_changelog_apply", cdc_changelog_apply, CDC_CHANGELOG_APPLY_SQL)
