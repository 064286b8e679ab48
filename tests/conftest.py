from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ad_hoc_olap_query_processing_engine_spark.session import get_spark
from ad_hoc_olap_query_processing_engine_spark.sources import catalog

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection mirroring the driver's oracle: base tables of the
    small scale factor registered as views."""

    cache: dict[str, duckdb.DuckDBPyConnection] = {}

    def make(sf_dir: str = SF_SMALL) -> duckdb.DuckDBPyConnection:
        if sf_dir not in cache:
            con = duckdb.connect()
            for t in catalog.TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            cache[sf_dir] = con
        return cache[sf_dir]

    yield make
    for con in cache.values():
        con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, row-sorted, string-normalized frame for comparison
    (mirrors the driver's order-insensitive compare)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, **kwargs) -> None:
    got_n, exp_n = normalize(got), normalize(exp)
    assert list(got_n.columns) == list(exp_n.columns), (
        f"column mismatch: {list(got_n.columns)} vs {list(exp_n.columns)}"
    )
    assert len(got_n) == len(exp_n), f"row count {len(got_n)} != {len(exp_n)}"
    # EXACT float compare (rtol=atol=0): the driver hash-matches raw values,
    # so any ulp drift a tolerance would hide still fails the round gate —
    # better to catch it here (this is how the DuckDB-AVG accumulation-order
    # flake was eventually found).
    pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False, rtol=0, atol=0)
