"""Golden Phi queries vs the DuckDB oracle (the driver's correctness gate,
replicated locally at sf0.001 for speed — the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from ad_hoc_olap_query_processing_engine_spark.phi import (
    compile_phi,
    golden_queries,
    phi_to_sql,
)
from ad_hoc_olap_query_processing_engine_spark.sources import catalog

from .conftest import SF_SMALL, assert_frames_match

GOLDENS = sorted(golden_queries().items())


@pytest.fixture(scope="module")
def sales(spark):
    return catalog.sales_df(spark, SF_SMALL)


@pytest.mark.parametrize("name,query", GOLDENS, ids=[n for n, _ in GOLDENS])
def test_golden_matches_oracle(name, query, spark, sales, duck):
    got = compile_phi(query, sales).toPandas()
    oracle = phi_to_sql(query, relation_sql=catalog.SALES_VIEW_SQL)
    exp = duck(SF_SMALL).sql(oracle).fetchdf()
    assert_frames_match(got, exp)


@pytest.mark.parametrize("name,query", GOLDENS, ids=[n for n, _ in GOLDENS])
def test_generated_sql_runs_on_spark_too(name, query, spark, sales):
    """The oracle SQL is ANSI enough for Spark itself — a third formulation
    agreeing with the DataFrame plan."""
    catalog.register_sales_view(spark, SF_SMALL)
    via_sql = spark.sql(phi_to_sql(query)).toPandas()
    via_df = compile_phi(query, sales).toPandas()
    assert_frames_match(via_df, via_sql)


def test_select_order_preserved(spark, sales):
    q = golden_queries()["phi_q3"]
    df = compile_phi(q, sales)
    assert df.columns == ["cust", "month", "avg_quant", "avg_quant_before", "avg_quant_after"]


def test_q5_having_is_discriminating(spark, sales):
    """HAVING must actually filter (guards against a vacuous golden)."""
    q = golden_queries()["phi_q5"]
    with_having = compile_phi(q, sales).count()
    q_no_having = golden_queries()["phi_q5"]
    q_no_having.having = None
    without = compile_phi(q_no_having, sales).count()
    assert 0 < with_having < without
