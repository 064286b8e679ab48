"""Similarity search over ``embeddings.embedding`` (array<float>, SURVEY.md
§2.3 — NOT-IN-REFERENCE; the ANN surface of a training-data pipeline).

sim_brute_topk    exact top-k cosine neighbors for a query set, computed with
                  built-in higher-order functions (zip_with + aggregate —
                  JVM-side, no Python). The query side is broadcast; the scan
                  side streams, so the plan is one pass over the vectors per
                  batch of queries. Scores are rounded to 4 dp so the DuckDB
                  oracle (list_cosine_similarity) hash-matches despite
                  engine-internal summation-order differences; ranking ties
                  break on vec_id.

sim_srp_ann       the scale path: 16-bit signed-random-projection signatures
                  (deterministic ±1 hyperplanes derived from md5 — no RNG),
                  computed as JVM column expressions; Hamming-0 bucket join
                  for candidates; exact re-rank of candidates only.
                  Approximate recall — registered rows-only (no SQL oracle);
                  tests assert its hits are a subset of the brute-force
                  ranking.

At 100 TB the brute path is O(Q·N) per query batch but embarrassingly
parallel with no shuffle (broadcast queries); the SRP path cuts candidates by
2^bits and shuffles once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

N_QUERIES = 10
TOP_K = 5
SRP_BITS = 16


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _exact_rerank(cand: DataFrame) -> DataFrame:
    """Shared exact-scoring tail: cosine (rounded to 4 dp for the cross-engine
    oracle), rank per query with vec_id tiebreak, keep top-k. ``cand`` needs
    columns query_id, q_emb, vec_id, embedding."""
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        _norm(F.col("q_emb")) * _norm(F.col("embedding"))
    )
    scored = cand.withColumn("score", F.round(cos, 4)).select(
        "query_id", "vec_id", "score"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "score", "rank")
    )


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = e.select(F.col("vec_id"), F.col("embedding")).join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    return _exact_rerank(cand)


SIM_BRUTE_TOPK_SQL = f"""\
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
           WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS score
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}"""


# ---------------------------------------------------------------------------
# sim_srp_ann — LSH-bucketed approximate neighbors (the scale path).
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5 — reproducible
    across sessions/machines without any RNG state."""
    import hashlib

    planes = []
    for b in range(SRP_BITS):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"srp:{b}:{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


SRP_BANDS = 4  # 4 bands × 4 bits: candidate iff ANY band signature matches


def _srp_band_cols(dim: int) -> Column:
    """Array of per-band SRP signatures (band id ⊕ 4 sign bits), JVM-side."""
    planes = _hyperplanes(dim)
    bits_per_band = SRP_BITS // SRP_BANDS
    bands = []
    for band in range(SRP_BANDS):
        sig = F.lit(0).cast("int")
        for j in range(bits_per_band):
            row = planes[band * bits_per_band + j]
            proj = _dot(F.col("embedding"), F.array(*[F.lit(x) for x in row]))
            bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
            sig = sig + (bit * F.lit(2**j)).cast("int")
        # offset so signatures from different bands never collide
        bands.append(sig + F.lit(band * 2**bits_per_band))
    return F.array(*bands)


def sim_srp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    dim = len(e.select("embedding").first()[0])
    buckets = e.select(
        "vec_id", "embedding", F.explode(_srp_band_cols(dim)).alias("bucket")
    )
    queries = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    # candidates: any matching band bucket (distinct — a pair can collide in
    # several bands); exact re-rank of candidates only
    cand = (
        buckets.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "q_emb", "vec_id", "embedding")
        .distinct()
    )
    return _exact_rerank(cand)


register("sim_brute_topk", sim_brute_topk, SIM_BRUTE_TOPK_SQL)
register("sim_srp_ann", sim_srp_ann, None)


# ---------------------------------------------------------------------------
# sim_ivf_ann — IVF (inverted-file) ANN: k-means coarse quantizer + probes.
# ---------------------------------------------------------------------------

IVF_CLUSTERS = 8
IVF_PROBES = 2


def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index sketch: partition vectors by nearest k-means centroid, then
    answer queries by exact-scoring only the IVF_PROBES nearest cells. The
    classic trade: train once (sampled k-means), then each query touches
    ~|probes|/|clusters| of the data. Approximate recall — registered
    rows-only; tests assert hits are a subset of the brute-force scoring.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, "embeddings", sf_dir).withColumn(
        "vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=IVF_CLUSTERS, seed=42, featuresCol="vec", predictionCol="cell")
    model = km.fit(e.select("vec"))
    assigned = model.transform(e).select("vec_id", "embedding", "cell")

    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    def _cell_dists(emb: Column) -> Column:
        """squared L2 distance to every centroid, as an array column."""
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        emb,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )

    # probe cells per query: indices of the IVF_PROBES smallest distances
    dists = _cell_dists(F.col("embedding"))
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists,
                    F.sequence(F.lit(0), F.lit(IVF_CLUSTERS - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        ),
        1,
        IVF_PROBES,
    )
    queries = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(probe_cells).alias("cell"),
        )
    )
    # join on the probe cell — candidates only from probed cells. No distinct
    # needed: each vector lives in exactly one cell and a query's probe cells
    # are distinct, so a (query, vector) pair can match at most once.
    cand = assigned.alias("v").join(
        F.broadcast(queries.alias("q")),
        (F.col("v.cell") == F.col("q.cell")) & (F.col("v.vec_id") != F.col("q.query_id")),
    ).select(
        F.col("q.query_id").alias("query_id"),
        F.col("q.q_emb").alias("q_emb"),
        F.col("v.vec_id").alias("vec_id"),
        F.col("v.embedding").alias("embedding"),
    )
    return _exact_rerank(cand)


register("sim_ivf_ann", sim_ivf_ann, None)
