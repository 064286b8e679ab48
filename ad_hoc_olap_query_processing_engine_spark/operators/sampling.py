"""Deterministic sampling operators (SURVEY.md §2.3 extension tier — the
"data mixture" step of a training-data pipeline: draw a balanced, reproducible
subset per stratum before tokenization).

pipe_stratified_sample  per-``lang`` simple random sample WITHOUT replacement
                        of K docs, made deterministic by ranking on an
                        md5-derived uniform hash of doc_id (identical in Spark
                        and DuckDB, so the sample itself is oracle-checked —
                        impossible with rand()/TABLESAMPLE, which never agree
                        across engines or even across runs).

Scale design (100 TB): a naive per-stratum ``row_number`` sorts every stratum
in one task — a hot-partition killer when a stratum holds billions of rows.
The operator instead two-phases it:

1. Bernoulli hash-gate: keep rows whose hash bucket falls under
   ``OVERSAMPLE·K/n`` of the bucket space (n = stratum count, from a tiny
   broadcast agg). Embarrassingly parallel map-side filter — the full-table
   pass touches no shuffle and survivors are ~OVERSAMPLE·K rows per stratum
   regardless of corpus size.
2. Exact rank on the survivors only: the window partition is now bounded at
   ~OVERSAMPLE·K rows, so the sort is trivial.

Because ranking is by a uniform hash, rank ≤ K over the gate's survivors
equals rank ≤ K over the full stratum (the gate keeps a hash-prefix superset
of the top-K) — the two-phase plan is exact, not approximate, as long as the
gate yields ≥ K survivors; with 4× oversampling the failure probability is
a Chernoff tail ≪ 1e-20 per stratum, and both engines run the identical
deterministic arithmetic either way, so the oracle can never diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

SAMPLE_K = 40
OVERSAMPLE = 4
HASH_BUCKETS = 1_000_000


def _doc_hash() -> F.Column:
    """48-bit uniform hash of doc_id — md5 of the decimal string, hex-parsed;
    bit-identical in DuckDB (see dedup._hash_fields for the same trick)."""
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")


def pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    # rank and gate on the SAME value (the bucket) — gating on h%B while
    # ranking on raw h would not be a prefix of the order
    h = d.select("doc_id", "lang", (_doc_hash() % HASH_BUCKETS).alias("__b"))
    counts = h.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    # gate threshold: FLOOR (not a bare bigint cast — Spark truncates where
    # DuckDB rounds) of the oversampled keep-fraction of the bucket space
    thresh = F.least(
        F.lit(HASH_BUCKETS).cast("bigint"),
        F.floor(F.lit(float(OVERSAMPLE * SAMPLE_K * HASH_BUCKETS)) / F.col("__n"))
        + F.lit(1),
    )
    gated = h.join(F.broadcast(counts), "lang").filter(F.col("__b") < thresh)
    rk = F.row_number().over(W.partitionBy("lang").orderBy("__b", "doc_id"))
    return (
        gated.withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .select("doc_id", "lang", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


PIPE_STRATIFIED_SAMPLE_SQL = f"""\
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           % {HASH_BUCKETS} AS b
  FROM documents),
n AS (SELECT lang, COUNT(*) AS cnt FROM h GROUP BY lang),
gated AS (
  SELECT h.doc_id, h.lang, h.b
  FROM h JOIN n USING (lang)
  WHERE b < LEAST({HASH_BUCKETS},
                  CAST(FLOOR({OVERSAMPLE * SAMPLE_K * HASH_BUCKETS}.0 / n.cnt) AS BIGINT) + 1)),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rk
  FROM gated)
SELECT doc_id, lang, CAST(rk AS INT) AS sample_rank
FROM ranked WHERE rk <= {SAMPLE_K}"""


register("pipe_stratified_sample", pipe_stratified_sample, PIPE_STRATIFIED_SAMPLE_SQL)


# ---------------------------------------------------------------------------
# pipe_weighted_sample — weighted random sampling WITHOUT replacement
# (Efraimidis–Spirakis): each doc draws a uniform u from its id hash and gets
# key ln(u)/w (w = doc length); the top-K keys ARE a weighted sample — longer
# docs proportionally likelier, the standard "sample by token count" mixture
# step. One map-side pass + a top-K (no per-stratum sort, no rand()):
# order-statistics on a global key is TakeOrdered at any scale. Determinism:
# u comes from the same 48-bit md5 uniform as pipe_stratified_sample, and the
# ln/division floats are identical IEEE inputs in both engines — adjacent
# keys are ~1e-3 apart at 500 docs while cross-engine libm drift is ≤1 ulp
# (~1e-16 relative), so the selected set and its ranking hash-match.
# ---------------------------------------------------------------------------

W_SAMPLE_K = 30


def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    u = (_doc_hash() + F.lit(1)).cast("double") / F.lit(float(2**48))  # (0, 1]
    key = F.log(u) / F.col("n_chars").cast("double")  # ES key, log-domain
    # top-K via orderBy+limit = TakeOrdered (per-partition heaps + tiny merge,
    # never a global sort/window); ranks are assigned on the K survivors only
    sampled = (
        d.select("doc_id", "lang", "n_chars", key.alias("__key"))
        .orderBy(F.desc("__key"), "doc_id")
        .limit(W_SAMPLE_K)
    )
    rk = F.row_number().over(W.orderBy(F.desc("__key"), "doc_id"))
    return sampled.select(
        "doc_id",
        "lang",
        "n_chars",
        rk.cast("int").alias("sample_rank"),
    )


PIPE_WEIGHTED_SAMPLE_SQL = f"""\
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1)
            / CAST({2**48} AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS k
  FROM documents),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rk
  FROM keyed)
SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS sample_rank
FROM ranked WHERE rk <= {W_SAMPLE_K}"""


register("pipe_weighted_sample", pipe_weighted_sample, PIPE_WEIGHTED_SAMPLE_SQL)


# ---------------------------------------------------------------------------
# pipe_bootstrap_ci — Poisson-bootstrap uncertainty for a corpus statistic
# (mean tokens per document, per language).  The classical bootstrap
# resamples n-of-n WITH replacement — impossible to coordinate across a
# distributed corpus — so production pipelines use the Poisson approximation:
# each row independently receives a Poisson(1) weight per replicate, giving
# every replicate an (approximately) resampled corpus in ONE pass with no
# coordination.  Weights here are DERANDOMIZED: a 48-bit md5 uniform per
# (doc, replicate) pushed through the fixed Poisson(1) inverse-CDF
# thresholds (literal integers, identical in both engines), so the whole
# "randomized" procedure is deterministic and oracle-checked — same
# contract as the hash-gated samplers above.
#
# Shape at 100 TB: explode ×REPS (map-side, no data skew — weights are
# arithmetic, not storage), one groupBy (lang, rep) for replicate sums, a
# lang-level reduce for the envelope.  Integer sums throughout; each
# replicate mean is one exact division.
# ---------------------------------------------------------------------------

BOOT_REPS = 16
# floor(1e6 · CDF_Poisson(1)(k)) for k = 0..6; bucket ≥ last ⇒ weight 7
_POIS_CDF_1E6 = (367879, 735758, 919698, 981011, 996340, 999405, 999916)


def _poisson_weight(bucket: F.Column) -> F.Column:
    w = F.lit(len(_POIS_CDF_1E6))  # tail: weight 7
    for k in reversed(range(len(_POIS_CDF_1E6))):
        w = F.when(bucket < _POIS_CDF_1E6[k], F.lit(k)).otherwise(w)
    return w


def pipe_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("__nt")
    )
    reps = d.select(
        "doc_id", "lang", "__nt", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("rep")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("rep").cast("string")).cast("binary")),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    weighted = reps.withColumn("__w", _poisson_weight(h % 1_000_000))
    # try_divide: a tiny stratum can draw all-zero Poisson weights for a
    # replicate — ANSI mode would raise DIVIDE_BY_ZERO where the oracle's
    # 0.0/0.0 yields NULL; NULL replicates then drop out of MIN/MAX
    rep_means = weighted.groupBy("lang", "rep").agg(
        F.try_divide(
            F.sum(F.col("__w") * F.col("__nt")).cast("double"),
            F.sum("__w").cast("double"),
        ).alias("__m")
    )
    point = d.groupBy("lang").agg(
        (F.sum("__nt").cast("double") / F.count(F.lit(1)).cast("double")).alias("mean_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    env = rep_means.groupBy("lang").agg(
        F.min("__m").alias("boot_lo"),
        F.max("__m").alias("boot_hi"),
    )
    return point.join(env, "lang").select(
        "lang", "n_docs", "mean_tokens", "boot_lo", "boot_hi"
    )


def _bootstrap_sql() -> str:
    cases = " ".join(
        f"WHEN b < {t} THEN {k}" for k, t in enumerate(_POIS_CDF_1E6)
    )
    return f"""\
WITH d AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS nt FROM documents),
reps AS (
  SELECT doc_id, lang, nt, i AS rep,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 12))::BIGINT
           % 1000000 AS b
  FROM d, unnest(range({BOOT_REPS})) AS u(i)),
weighted AS (
  SELECT lang, rep, nt,
         CASE {cases} ELSE {len(_POIS_CDF_1E6)} END AS w
  FROM reps),
rep_means AS (
  SELECT lang, rep,
         CAST(SUM(w * nt) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
  FROM weighted GROUP BY lang, rep),
point AS (
  SELECT lang,
         CAST(SUM(nt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
         COUNT(*) AS n_docs
  FROM d GROUP BY lang)
SELECT p.lang, p.n_docs, p.mean_tokens,
       MIN(r.m) AS boot_lo, MAX(r.m) AS boot_hi
FROM point p JOIN rep_means r ON p.lang = r.lang
GROUP BY p.lang, p.n_docs, p.mean_tokens"""


register("pipe_bootstrap_ci", pipe_bootstrap_ci, _bootstrap_sql())


# ---------------------------------------------------------------------------
# pipe_kfold_split — deterministic k-fold assignment for eval splits: fold =
# md5-uniform(doc_id) mod K, so the split is reproducible across runs,
# engines, and cluster sizes (no rand(), no row-order dependence), and
# folds are disjoint-and-exhaustive BY CONSTRUCTION — the property a
# training pipeline must guarantee before trusting held-out metrics.  The
# fold profile (doc/token mass per fold) is what a pipeline inspects to
# confirm the hash is balanced before training; per-lang counts surface
# stratification skew.  Pure map + one aggregate.
# ---------------------------------------------------------------------------

KFOLDS = 5


def pipe_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    fold = (_doc_hash() % KFOLDS).cast("int")
    return (
        d.select(
            fold.alias("fold"),
            "lang",
            F.size(F.split("text", " ")).alias("__nt"),
        )
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("total_tokens"),
        )
    )


PIPE_KFOLD_SPLIT_SQL = f"""\
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
            % {KFOLDS} AS INT) AS fold,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1, 2"""


register("pipe_kfold_split", pipe_kfold_split, PIPE_KFOLD_SPLIT_SQL)
