"""Every registered non-Phi operator with an oracle must match DuckDB at
sf0.001 (same contract the driver enforces at sf0.01)."""

from __future__ import annotations

import pytest

from ad_hoc_olap_query_processing_engine_spark.operators import registry

from .conftest import SF_SMALL, assert_frames_match

OPS = sorted(registry.all_ops().items())


@pytest.mark.parametrize("name,op", OPS, ids=[n for n, _ in OPS])
def test_op_matches_oracle(name, op, spark, duck):
    got = op.run(spark, SF_SMALL).toPandas()
    if op.oracle is None:
        assert len(got) >= 0  # rows-only smoke (approximate/streaming ops)
        return
    # lazy oracles (callable over sf_dir) bake data-derived literals — here
    # they must resolve at the SAME sf the Spark side ran at
    oracle = op.oracle(SF_SMALL) if callable(op.oracle) else op.oracle
    exp = duck(SF_SMALL).sql(oracle).fetchdf()
    assert_frames_match(got, exp)
