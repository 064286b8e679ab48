"""Composed training-corpus pipeline (SURVEY.md §2.3 extension tier).

pipe_corpus_filter  the end-to-end "kept corpus" query a training-data
                    pipeline actually ships: quality-score every document
                    (C4/Gopher-style heuristics, text.quality_frame), mine
                    near-duplicate clusters (MinHash-LSH pairs → connected
                    components, dedup.connected_components), and keep the
                    documents that pass quality AND are their cluster's
                    canonical representative (non-keepers drop via a
                    LEFT ANTI join). Demonstrates that the operator tiers
                    compose: the same building blocks that are individually
                    oracle-checked chain into one plan, and the chained
                    result is oracle-checked too (quality CTE + recursive-CTE
                    components in one DuckDB statement).

At 100 TB: quality scoring is shuffle-free map work; the dedup subtree is
the bucketed LSH pipeline (never all-pairs); the final anti-join keys on
doc_id — the non-keeper side scales with the corpus duplicate rate, so no
broadcast hint (AQE broadcasts when it happens to be small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .dedup import _minhash_ctes, _shingles, connected_components, minhash_pairs
from .registry import register
from .text import TEXT_QUALITY_SQL, quality_frame


def pipe_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    sh = _shingles(d).persist()
    cc = connected_components(minhash_pairs(sh))
    nonkeep = cc.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    q = quality_frame(d).filter(F.col("keep"))
    # no broadcast hint: the non-keeper set is a duplicate-rate fraction of
    # the whole corpus — shuffle anti-join is the scale-correct default and
    # AQE still broadcasts when the set turns out small
    return (
        q.join(nonkeep, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens")
    )


def _corpus_filter_sql() -> str:
    return f"""\
WITH RECURSIVE {_minhash_ctes()},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM vpairs
  UNION
  SELECT doc_b, doc_a FROM vpairs),
walk(u, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.u),
cc AS (SELECT u AS doc_id, MIN(l) AS cluster_id FROM walk GROUP BY u),
nonkeep AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id),
q AS ({TEXT_QUALITY_SQL})
SELECT d.doc_id, d.lang, q.n_tokens
FROM documents d
JOIN q ON q.doc_id = d.doc_id
WHERE q.keep AND d.doc_id NOT IN (SELECT doc_id FROM nonkeep)"""


register("pipe_corpus_filter", pipe_corpus_filter, _corpus_filter_sql())
