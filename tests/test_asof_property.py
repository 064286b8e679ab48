"""Property test: the union+window asof_join must agree with pandas
merge_asof — an independent reference implementation — on random inputs
(random key sets, duplicate timestamps on the left, empty right partitions,
right rows after every left row)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ad_hoc_olap_query_processing_engine_spark.operators.advanced import asof_join

T0 = dt.datetime(2024, 1, 1)


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 4))
    left = []
    right = []
    eid = 0
    for k in range(n_keys):
        for _ in range(draw(st.integers(0, 6))):
            eid += 1
            left.append((eid, k, T0 + dt.timedelta(minutes=draw(st.integers(0, 500)))))
        for _ in range(draw(st.integers(0, 6))):
            # distinct right timestamps per key: merge_asof and the window
            # formulation only agree on a deterministic pick when (key, ts)
            # is unique on the right — mirrored by the dedup below
            right.append((k, T0 + dt.timedelta(minutes=draw(st.integers(0, 500))), float(draw(st.integers(1, 100)))))
    rdf = pd.DataFrame(right, columns=["user_id", "ts", "value"])
    rdf = rdf.sort_values("value").drop_duplicates(["user_id", "ts"], keep="last")
    return pd.DataFrame(left, columns=["event_id", "user_id", "ts"]), rdf


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=asof_case())
def test_asof_join_matches_pandas_merge_asof(case, spark):
    lpdf, rpdf = case
    if lpdf.empty:
        return
    left = spark.createDataFrame(lpdf)
    right = (
        spark.createDataFrame(rpdf)
        if not rpdf.empty
        else spark.createDataFrame([], "user_id bigint, ts timestamp, value double")
    )
    got = (
        asof_join(left, right, ["user_id"], left_ts="ts", right_ts="ts", value_cols=["value"])
        .select("event_id", "asof_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    if rpdf.empty:
        assert got["asof_value"].isna().all()
        return
    exp = (
        pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        .rename(columns={"value": "asof_value"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        got["asof_value"], exp["asof_value"], check_dtype=False
    )
