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


# ---------------------------------------------------------------------------
# func_collection_surface — array + higher-order (lambda) functions over the
# tokenized documents: transform / filter / aggregate-fold / slice / sort /
# distinct / contains / sequence, all JVM-side and all with exact integer or
# string results so DuckDB's list_* twins hash-match. Map functions are
# deliberately excluded from the oracle: Spark throws on duplicate keys where
# DuckDB keeps the first — semantics differ, documented not hidden.
# ---------------------------------------------------------------------------


def func_collection_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        F.size(F.array_distinct(words)).cast("int").alias("n_distinct"),
        F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
        F.element_at(F.array_sort(words), 1).alias("first_sorted"),
        F.array_contains(words, "the").alias("has_the"),
        F.array_max(F.transform(words, F.length)).cast("int").alias("max_word_len"),
        F.aggregate(
            F.transform(words, F.length), F.lit(0), lambda a, x: a + x
        ).cast("bigint").alias("total_chars"),
        F.size(
            F.filter(
                F.sequence(F.lit(1), F.size(words)), lambda x: x % 2 == 0
            )
        ).cast("int").alias("n_even_positions"),
    )


FUNC_COLLECTION_SURFACE_SQL = """\
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT)                         AS n_words,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT)         AS n_distinct,
       array_to_string(string_split(text, ' ')[1:3], '-')               AS first3,
       list_sort(string_split(text, ' '))[1]                            AS first_sorted,
       list_contains(string_split(text, ' '), 'the')                    AS has_the,
       CAST(list_max(list_transform(string_split(text, ' '), x -> length(x))) AS INT)
                                                                        AS max_word_len,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT)
                                                                        AS total_chars,
       CAST(len(list_filter(range(1, len(string_split(text, ' ')) + 1),
                            x -> x % 2 = 0)) AS INT)                    AS n_even_positions
FROM documents"""


register("func_collection_surface", func_collection_surface, FUNC_COLLECTION_SURFACE_SQL)


# ---------------------------------------------------------------------------
# func_json_schema — schema-on-read certification: serialize typed event
# rows to JSON documents (to_json over a nested struct with an array
# field), parse them back with an EXPLICIT schema (from_json — the
# schema-on-read contract: no inference job, malformed rows become NULL
# instead of failing the query), explode the nested array, aggregate.
# Complements func_json_extract (path extraction on stored JSON): this op
# pins that a nested-document round-trip is lossless and type-faithful.
# The DuckDB oracle never touches JSON — it states the same aggregate
# directly over the source columns, so agreement proves the round-trip
# dropped nothing.  At 100 TB both json expressions are JVM codegen
# (Jackson under whole-stage codegen), and the explicit schema avoids the
# schema-inference scan a samplingRatio read would cost.
# ---------------------------------------------------------------------------


def func_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("et"),
            F.col("value").alias("v"),
            F.array("user_id", "event_id").alias("ids"),
        )
    )
    parsed = F.from_json(doc, "et string, v double, ids array<bigint>")
    return (
        e.select(parsed.alias("p"))
        .select("p.et", "p.v", F.explode("p.ids").alias("id_val"))
        .groupBy(F.col("et"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("id_val").cast("bigint").alias("sum_ids"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sum_v"),
        )
    )


FUNC_JSON_SCHEMA_SQL = """\
SELECT event_type AS et,
       2 * COUNT(*) AS n_rows,
       CAST(SUM(user_id) + SUM(event_id) AS BIGINT) AS sum_ids,
       CAST(2 * SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
FROM events
GROUP BY event_type"""


register("func_json_schema", func_json_schema, FUNC_JSON_SCHEMA_SQL)


# ---------------------------------------------------------------------------
# rel_nullsafe_join — null-safe equality join (<=> / IS NOT DISTINCT FROM):
# the join-surface variant where NULL keys MATCH each other instead of
# dropping out, required whenever the join key is an optional attribute.
# The driver tables carry no NULLs, so a nullable key is derived
# (NULLIF(c_mktsegment, 'BUILDING') — BUILDING customers become the NULL
# group); the dimension side aggregates per nullable key, and the join
# brings each customer its group's profile INCLUDING the NULL group (a
# plain equi-join would silently lose those rows).  Catalyst plans <=> as
# an ordinary hash join (null-safe keys hash like values), broadcast here.
# The Phi planner uses eqNullSafe defensively (phi/planner.py:286); this
# query pins the semantics against DuckDB's IS NOT DISTINCT FROM on keys
# that are REALLY null.
# ---------------------------------------------------------------------------


def rel_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    key = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    left = c.select("c_custkey", F.col("c_acctbal"), key.alias("seg_key"))
    prof = (
        c.select(key.alias("p_key"), "c_acctbal")
        .groupBy("p_key")
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("grp_bal"),
        )
    )
    joined = left.join(F.broadcast(prof), left["seg_key"].eqNullSafe(prof["p_key"]))
    return joined.groupBy("seg_key").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.first("grp_n").alias("grp_n"),
        F.first("grp_bal").alias("grp_bal"),
    )


REL_NULLSAFE_JOIN_SQL = """\
WITH l AS (
  SELECT c_custkey, c_acctbal, NULLIF(c_mktsegment, 'BUILDING') AS seg_key
  FROM customer),
prof AS (
  SELECT NULLIF(c_mktsegment, 'BUILDING') AS p_key,
         COUNT(*) AS grp_n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS grp_bal
  FROM customer GROUP BY 1)
SELECT seg_key, COUNT(*) AS n_customers,
       ANY_VALUE(grp_n) AS grp_n, ANY_VALUE(grp_bal) AS grp_bal
FROM l JOIN prof ON l.seg_key IS NOT DISTINCT FROM prof.p_key
GROUP BY seg_key"""


register("rel_nullsafe_join", rel_nullsafe_join, REL_NULLSAFE_JOIN_SQL)


# ---------------------------------------------------------------------------
# func_map_surface — MapType pipeline: build a per-user event-type→count
# map (map_from_entries over a SORTED entry list — map column equality and
# iteration order are unspecified, so deterministic construction matters),
# then drive the higher-order map functions: map_filter (heavy types),
# transform_values (rescaled counts), element_at (point lookup),
# map_keys/cardinality (profile width).  Like func_json_schema, the DuckDB
# oracle never builds a map — it states the same facts with conditional
# aggregation, so a hash match proves the map pipeline is lossless.  All
# map work is JVM expression codegen over the already-aggregated per-user
# rows.
# ---------------------------------------------------------------------------


def func_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
    )
    per_user = counts.groupBy("user_id").agg(m.alias("m"))
    heavy = F.map_filter(F.col("m"), lambda k, v: v > 10)
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    return per_user.select(
        "user_id",
        F.cardinality("m").alias("n_types"),
        F.cardinality(heavy).alias("n_heavy_types"),
        F.coalesce(F.element_at(doubled, "click"), F.lit(0)).alias("clicks_x2"),
        F.array_join(F.sort_array(F.map_keys(heavy)), ",").alias("heavy_keys"),
    )


FUNC_MAP_SURFACE_SQL = """\
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS cnt
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN cnt > 10 THEN 1 ELSE 0 END) AS INT) AS n_heavy_types,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN cnt * 2 END), 0) AS BIGINT)
         AS clicks_x2,
       COALESCE(string_agg(CASE WHEN cnt > 10 THEN event_type END, ','
                           ORDER BY event_type), '') AS heavy_keys
FROM counts
GROUP BY user_id"""


register("func_map_surface", func_map_surface, FUNC_MAP_SURFACE_SQL)


# ---------------------------------------------------------------------------
# func_csv_schema — the CSV twin of func_json_schema: serialize typed order
# rows to delimited text (to_csv over a struct), parse back with an explicit
# from_csv schema, aggregate the recovered fields.  The schema-on-read
# contract matters doubly for CSV (no self-describing types at all — every
# recovered column is the parser's cast).  The DuckDB oracle states the same
# aggregate directly over the source columns with no CSV anywhere, so a hash
# match proves the text round-trip is lossless for the declared types.
# Timestamps ride as epoch micros (BIGINT) — locale-proof, no format string.
# ---------------------------------------------------------------------------


def func_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("p"),
            F.col("o_totalprice").alias("t"),
            F.unix_micros("o_orderdate").alias("d_us"),
        )
    )
    parsed = F.from_csv(line, "k bigint, p string, t double, d_us bigint")
    return (
        o.select(parsed.alias("r"))
        .groupBy(F.col("r.p").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("r.t").cast("decimal(18,2)")).cast("double").alias("total_price"),
            F.min("r.d_us").alias("first_order_us"),
            F.max("r.k").alias("max_orderkey"),
        )
    )


FUNC_CSV_SCHEMA_SQL = """\
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       MIN(epoch_us(o_orderdate)) AS first_order_us,
       MAX(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_orderpriority"""


register("func_csv_schema", func_csv_schema, FUNC_CSV_SCHEMA_SQL)


# ---------------------------------------------------------------------------
# func_variant_shred — the Spark 4 VARIANT path: build a nested JSON document
# per order, parse it to VariantType (parse_json), and shred typed fields
# back out with variant_get ('$.status' string, '$.amounts.total' double,
# '$.flags[0]' boolean) before aggregating.  VARIANT is Spark's
# semi-structured fast path (binary-encoded, no per-access string
# re-parsing — the replacement for get_json_object hot loops at scale).
# The DuckDB oracle is deliberately JSON-FREE: it recomputes the same
# aggregates straight from the base columns, so the check certifies the
# entire to_json → parse_json → variant_get round-trip against first
# principles (same pattern as func_json_schema / func_csv_schema).
# ---------------------------------------------------------------------------


def func_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    doc = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.struct(F.col("o_totalprice").alias("total")).alias("amounts"),
            F.array(F.col("o_totalprice") > 200000.0).alias("flags"),
        )
    )
    v = o.select(F.col("o_orderkey"), F.parse_json(doc).alias("v"))
    shredded = v.select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.amounts.total", "double").alias("total"),
        F.variant_get("v", "$.flags[0]", "boolean").alias("is_large"),
    )
    return shredded.groupBy("status", "is_large").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("total").cast("decimal(18,2)")).cast("double").alias("sum_total"),
    )


FUNC_VARIANT_SHRED_SQL = """\
SELECT o_orderstatus              AS status,
       o_totalprice > 200000.0    AS is_large,
       COUNT(*)                   AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY 1, 2"""


register("func_variant_shred", func_variant_shred, FUNC_VARIANT_SHRED_SQL)


# ---------------------------------------------------------------------------
# func_calendar_surface — the calendar-arithmetic function family over the
# order timeline: month arithmetic WITH end-of-month clamping (add_months:
# Jan 31 + 3 months = Apr 30 in both engines), last_day, ISO Monday week
# truncation, day-of-year, quarter.  Every date output ships as a formatted
# string so the cross-engine compare sees identical values rather than
# date-vs-timestamp dtype artifacts.  Pure map over the scan — no shuffle;
# fused into whole-stage codegen.
# ---------------------------------------------------------------------------


def func_calendar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "week_start"
        ),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("qtr"),
    )


FUNC_CALENDAR_SURFACE_SQL = """\
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')  AS plus3m,
       strftime(last_day(o_orderdate), '%Y-%m-%d')           AS month_end,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       CAST(dayofyear(o_orderdate) AS INT)                   AS doy,
       CAST(quarter(o_orderdate) AS INT)                     AS qtr
FROM orders"""


register("func_calendar_surface", func_calendar_surface, FUNC_CALENDAR_SURFACE_SQL)


# ---------------------------------------------------------------------------
# func_try_surface — ANSI-mode-safe error handling: Spark 4 runs under ANSI
# SQL semantics where division by zero and bad casts RAISE instead of
# silently corrupting, and the try_* family is the sanctioned way to opt
# back into NULL-on-error per expression.  Exercised here: try_divide with
# genuinely-zero denominators (brands with no sub-5 part sizes) and
# try_cast on both a parseable suffix ('Brand#12' → 12) and an
# unparseable string (p_type → NULL).  The DuckDB oracle states the same
# semantics with NULLIF and TRY_CAST — the agreement pins that NULL (not
# an error, not ±inf) is what flows downstream.
# ---------------------------------------------------------------------------


def func_try_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    enriched = p.select(
        F.expr("try_cast(substring(p_brand, 7, 10) AS INT)").alias("brand_num"),
        F.expr("try_cast(p_type AS INT)").alias("type_num"),  # always NULL
        "p_size",
    )
    return enriched.groupBy("brand_num").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count("type_num").alias("n_parsed_types"),  # 0: NULLs don't count
        F.sum(F.when(F.col("p_size") > 45, 1).otherwise(0)).alias("n_large"),
        F.sum(F.when(F.col("p_size") < 5, 1).otherwise(0)).alias("n_small"),
        F.try_divide(
            F.sum(F.when(F.col("p_size") > 45, 1).otherwise(0)),
            F.sum(F.when(F.col("p_size") < 5, 1).otherwise(0)),
        ).alias("large_small_ratio"),
    )


FUNC_TRY_SURFACE_SQL = """\
SELECT TRY_CAST(substr(p_brand, 7, 10) AS INT) AS brand_num,
       COUNT(*) AS n_parts,
       COUNT(TRY_CAST(p_type AS INT)) AS n_parsed_types,
       CAST(SUM(CASE WHEN p_size > 45 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
       CAST(SUM(CASE WHEN p_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
       CAST(SUM(CASE WHEN p_size > 45 THEN 1 ELSE 0 END) AS DOUBLE)
         / NULLIF(CAST(SUM(CASE WHEN p_size < 5 THEN 1 ELSE 0 END) AS DOUBLE), 0)
         AS large_small_ratio
FROM part
GROUP BY 1"""


register("func_try_surface", func_try_surface, FUNC_TRY_SURFACE_SQL)


# ---------------------------------------------------------------------------
# func_aes_roundtrip — column-level encryption for data governance:
# aes_encrypt (AES-GCM, random IV per row — ciphertexts are intentionally
# non-deterministic) protects the PII column at rest, aes_decrypt restores
# it for authorized readers.  The registered query aggregates over the
# DECRYPTED values, so the oracle (which reads the plaintext directly)
# hash-matches iff decrypt∘encrypt is the identity for every row — the
# round-trip is checkable even though no two ciphertext runs ever repeat.
# A tamper canary (try_aes_decrypt under a WRONG key → NULL, never
# plaintext) rides the same aggregate.
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # 16-byte demo key; production: column key from a KMS
_AES_BAD_KEY = "fedcba9876543210"


def func_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    enc = F.expr(f"aes_encrypt(c_name, '{_AES_KEY}')")
    protected = c.select(
        "c_mktsegment",
        "c_name",
        enc.alias("__ct"),
    )
    back = protected.select(
        "c_mktsegment",
        "c_name",
        F.expr(f"CAST(aes_decrypt(__ct, '{_AES_KEY}') AS STRING)").alias("__pt"),
        F.expr(f"try_aes_decrypt(__ct, '{_AES_BAD_KEY}')").alias("__bad"),
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("__pt") == F.col("c_name"), 1).otherwise(0)).alias(
            "n_roundtripped"
        ),
        F.count("__bad").alias("n_wrong_key_leaks"),  # MUST be 0
        F.md5(
            F.concat_ws(
                "|", F.array_sort(F.collect_list("__pt"))
            ).cast("binary")
        ).alias("decrypted_digest"),
    )


FUNC_AES_ROUNDTRIP_SQL = """\
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(*) AS n_roundtripped,
       0        AS n_wrong_key_leaks,
       md5(string_agg(c_name, '|' ORDER BY c_name)) AS decrypted_digest
FROM customer
GROUP BY c_mktsegment"""


register("func_aes_roundtrip", func_aes_roundtrip, FUNC_AES_ROUNDTRIP_SQL)


# ---------------------------------------------------------------------------
# func_url_parse — the URL-function surface (parse_url PROTOCOL/HOST/PATH/
# QUERY-param) plus naive registrable-domain decomposition, the backbone of
# corpus curation at scale (domain-level mixing, URL dedup, blocklists all
# key on the registrable domain).  The corpus fixture carries no URLs, so a
# deterministic URL is SYNTHESIZED per document from (source, lang, doc_id)
# — identical || expression in both engines — and the OPERATOR under test is
# the parse: Spark's java.net-backed parse_url vs an independent regexp
# formulation in the DuckDB oracle, so agreement checks real parser
# semantics, not a shared implementation.  Registrable domain is last-2-
# labels (a real pipeline swaps in the public-suffix list — a broadcast map
# join — without changing this plan shape).  Pure JVM row expressions, zero
# shuffles, scan + project only.
# ---------------------------------------------------------------------------

_URL_SYNTH = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'files.' ELSE '' END || source"
    " || '.example.' || CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END"
    " || '/' || lang || '/doc-' || doc_id || '.html?ref=' || (doc_id % 7)"
    " || '&utm=mail'"
)


def func_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.withColumn("__url", F.expr(_URL_SYNTH)).select(
        "doc_id",
        F.expr("parse_url(__url, 'PROTOCOL')").alias("proto"),
        F.expr("parse_url(__url, 'HOST')").alias("host"),
        F.expr("parse_url(__url, 'PATH')").alias("path"),
        F.expr("CAST(parse_url(__url, 'QUERY', 'ref') AS INT)").alias("ref"),
        F.expr(
            "array_join(slice(split(parse_url(__url, 'HOST'), '\\\\.'), 1, "
            "size(split(parse_url(__url, 'HOST'), '\\\\.')) - 2), '.')"
        ).alias("subdomain"),
        F.expr(
            "element_at(split(parse_url(__url, 'HOST'), '\\\\.'), -2) || '.' || "
            "element_at(split(parse_url(__url, 'HOST'), '\\\\.'), -1)"
        ).alias("domain"),
    )


FUNC_URL_PARSE_SQL = f"""\
WITH u AS (
  SELECT doc_id, {_URL_SYNTH} AS url FROM documents),
h AS (
  SELECT doc_id, url,
         regexp_extract(url, '^([a-z]+)://', 1)        AS proto,
         regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host
  FROM u),
t AS (SELECT *, string_split(host, '.') AS toks FROM h)
SELECT doc_id,
       proto,
       host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)       AS path,
       CAST(regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS INT)    AS ref,
       array_to_string(toks[1:len(toks) - 2], '.')                AS subdomain,
       toks[-2] || '.' || toks[-1]                                AS domain
FROM t"""


register("func_url_parse", func_url_parse, FUNC_URL_PARSE_SQL)


# ---------------------------------------------------------------------------
# func_regex_surface — the regexp function surface certified on the
# RE2-SAFE dialect subset where Java regex (Spark) and RE2 (DuckDB) agree:
# character classes, quantifiers, alternation, anchors, capture groups —
# deliberately NO backreferences, lookaround, or possessive quantifiers
# (documented engine-divergence territory; the module docstring's exclusion
# list).  Exercises regexp_extract (group pick), regexp_replace (global),
# full-match (rlike vs regexp_full_match), match counting
# (regexp_extract_all length — Spark's regexp_count mirrors
# len(regexp_extract_all) in DuckDB), and regex split.  Pure row-local JVM
# work on the scan.
# ---------------------------------------------------------------------------


def func_regex_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)-", 1).alias("prio_num"),
        F.regexp_replace("o_orderpriority", r"[AEIOU]", "_").alias("devoweled"),
        F.col("o_orderpriority").rlike(r"^\d-[A-Z]+$").alias("is_canonical"),
        F.expr(r"regexp_count(o_orderpriority, '[A-Z]')").cast("int").alias(
            "n_upper"
        ),
        F.size(F.split("o_orderpriority", r"[-\s]+")).cast("int").alias("n_parts"),
        F.regexp_extract(F.expr("CAST(o_totalprice AS STRING)"), r"^(\d+)\.", 1)
        .alias("dollars_str"),
    )


FUNC_REGEX_SURFACE_SQL = """\
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '^(\\d+)-', 1)            AS prio_num,
       regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g')      AS devoweled,
       regexp_full_match(o_orderpriority, '\\d-[A-Z]+')          AS is_canonical,
       CAST(len(regexp_extract_all(o_orderpriority, '[A-Z]')) AS INT) AS n_upper,
       CAST(len(regexp_split_to_array(o_orderpriority, '[-\\s]+')) AS INT) AS n_parts,
       regexp_extract(CAST(o_totalprice AS VARCHAR), '^(\\d+)\\.', 1) AS dollars_str
FROM orders"""


register("func_regex_surface", func_regex_surface, FUNC_REGEX_SURFACE_SQL)


# ---------------------------------------------------------------------------
# func_bitwise_surface — the bitwise/bit-function surface (AND/OR/XOR,
# shifts, bit_count, single-bit probe) the bitmap-index tier builds on
# (prefilter.py packs keys with exactly these), certified as a row-level
# function surface in its own right.  Shift semantics pinned on BIGINT:
# Spark shiftleft/shiftright on int64 and DuckDB's <</>> agree for shift
# amounts < 64 (the bitmap tier's block math keeps shifts in [0, 63] by
# construction; bit 63 wrap behavior is pinned separately in
# tests/test_prefilter.py).  Pure scan + project.
# ---------------------------------------------------------------------------


def func_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        (k.bitwiseAND(F.lit(255))).alias("low8"),
        (k.bitwiseOR(F.lit(4096))).alias("with_bit12"),
        (k.bitwiseXOR(F.col("o_custkey"))).alias("xor_cust"),
        F.expr("shiftleft(o_orderkey, 3)").alias("shl3"),
        F.expr("shiftright(o_orderkey, 4)").alias("shr4"),
        F.expr("bit_count(o_orderkey)").cast("int").alias("popcount"),
        F.expr("(o_orderkey & (1 << CAST(o_custkey % 16 AS INT))) != 0").alias(
            "probe_bit"
        ),
    )


FUNC_BITWISE_SURFACE_SQL = """\
SELECT o_orderkey,
       o_orderkey & 255                              AS low8,
       o_orderkey | 4096                             AS with_bit12,
       xor(o_orderkey, o_custkey)                    AS xor_cust,
       o_orderkey << 3                               AS shl3,
       o_orderkey >> 4                               AS shr4,
       CAST(bit_count(o_orderkey) AS INT)            AS popcount,
       (o_orderkey & (1::BIGINT << CAST(o_custkey % 16 AS INT))) <> 0
                                                     AS probe_bit
FROM orders"""


register("func_bitwise_surface", func_bitwise_surface, FUNC_BITWISE_SURFACE_SQL)
