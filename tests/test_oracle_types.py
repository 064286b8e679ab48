"""Oracle result-type lint.

The driver hash-matches Spark results against DuckDB oracle results. DuckDB
types an uncast ``SUM(int)`` / ``list_sum(int)`` as HUGEINT (int128) and an
uncast DECIMAL stays DECIMAL — both serialize differently from Spark's
BIGINT/DOUBLE in the driver's value-hash, flipping hash_match false even when
every value is identical (round-5 postmortem: 6/50 driver rows red purely for
this; see VERDICT.md round 5 "What's wrong" #1).

This lint binds every registered oracle against the sf0.001 views and asserts
every output column's declared DuckDB type is in the closed allow-set that is
known to hash identically to the matching Spark type. Binding only (no
execution) — the whole sweep is sub-second.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Closed allow-set: these DuckDB types hash identically to their Spark
# counterparts under the driver's canonicalization. Anything else (HUGEINT,
# DECIMAL, TIMESTAMP WITH TIME ZONE, nested types, ...) must be CAST in the
# oracle SQL to one of these.
ALLOWED = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _bad_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    return [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    ]


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_result_types_in_allow_set(con, name):
    bad = _bad_columns(con, _oracles()[name])
    assert not bad, (
        f"oracle '{name}' outputs driver-hash-unsafe DuckDB types {bad}; "
        f"CAST them to one of {sorted(ALLOWED)} in the oracle SQL"
    )
