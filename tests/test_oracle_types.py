"""Oracle result-type lint (pytest gate).

See ad_hoc_olap_query_processing_engine_spark/oracle_lint.py — the shared
single-source-of-truth allow-set and bind-time column lint — for why this
exists (round-5 postmortem: 6/50 driver rows hash-red purely because uncast
``SUM(int)`` oracles typed as HUGEINT). This file parametrizes that lint
over every registered oracle against the sf0.001 views; binding only, the
whole sweep is sub-second.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ad_hoc_olap_query_processing_engine_spark.oracle_lint import (
    ALLOWED_TYPES,
    TABLES,
    bad_columns,
)

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_result_types_in_allow_set(con, name):
    bad = bad_columns(con, _oracles()[name])
    assert not bad, (
        f"oracle '{name}' outputs driver-hash-unsafe DuckDB types {bad}; "
        f"CAST them to one of {sorted(ALLOWED_TYPES)} in the oracle SQL"
    )
