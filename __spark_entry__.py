"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine layout: see ``ad_hoc_olap_query_processing_engine_spark/`` (SURVEY.md is the blueprint).
The Phi (MF/EMF) golden queries come from the reference corpus
(/root/reference/src/Ad_hoc_Input.txt, SURVEY.md §2.2); their oracle SQL is
*generated* by phi/sqlgen.py in a deliberately different (naive join-agg)
formulation than the optimized DataFrame plans, so agreement is a real check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ad_hoc_olap_query_processing_engine_spark.phi import (
    all_phi_queries,
    compile_phi,
    phi_to_sql,
)
from ad_hoc_olap_query_processing_engine_spark.sources import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["phi_q1"](spark, "/root/testdata/sf0.001")


def _phi_runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        q = all_phi_queries()[name]
        return compile_phi(q, catalog.sales_df(spark, sf_dir))

    return run


# Queries the round-2 driver never reached (CORRECTNESS_r02.json stopped at
# 50 rows, module-import order). Listed FIRST so a budget-limited driver
# checks them before re-confirming the already-green tail; the round-1 ERR
# reformulations (mm_feature_extract, sim_srp_ann, sim_ivf_ann) lead.
_CHECK_FIRST = (
    "text_bm25_topk",
    "udf_weighted_avg",
    "pipe_pack_bins",
    "mm_arrow_bytesum",
    "func_multires_rollup",
    "pipe_weighted_sample",
    "rel_asof_tolerance",
    "rel_heavy_hitters",
    "text_rarity_score",
    "rel_skew_salted_join",
    "mm_feature_extract",
    "sim_srp_ann",
    "sim_ivf_ann",
    "dedup_embedding",
    "embed_centroids",
    "embed_knn_classify",
    "sim_brute_topk",
    "func_timebucket",
    "rel_funnel",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_stateful_user_agg",
    "stream_dedup",
    "stream_stream_join",
    "stream_static_join",
    "mm_byte_stats",
    "mm_frame_sample",
    "mm_resize",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_ngram_topk",
    "text_repetition",
    "text_vocab",
    "text_tfidf_topk",
    "pipe_corpus_filter",
    "pipe_token_chunks",
    "pipe_decontaminate",
    "pipe_shard_shuffle",
    "pipe_stratified_sample",
    "func_scalar_surface",
    "func_collection_surface",
    "src_pyds_docstats",
)


def _prioritize(full: dict) -> dict:
    head = {n: full[n] for n in _CHECK_FIRST if n in full}
    head.update((n, r) for n, r in full.items() if n not in head)
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in all_phi_queries():
        out[name] = _phi_runner(name)

    from ad_hoc_olap_query_processing_engine_spark.operators import registry

    out.update(registry.spark_queries())
    return _prioritize(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each queries() key (tables pre-registered
    as views; the `sales` relation is inlined as a CTE)."""
    out = {
        name: phi_to_sql(q, relation_sql=catalog.SALES_VIEW_SQL)
        for name, q in all_phi_queries().items()
    }

    from ad_hoc_olap_query_processing_engine_spark.operators import registry

    out.update(registry.oracle_sqls())
    return _prioritize(out)
