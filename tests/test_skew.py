"""Salted aggregation/join must be result-identical to the unsalted plans —
skew mitigation is a physical rewrite, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from ad_hoc_olap_query_processing_engine_spark.operators import skew
from ad_hoc_olap_query_processing_engine_spark.sources import catalog

from .conftest import SF_SMALL, assert_frames_match


def test_salted_groupby_matches_plain(spark):
    l = catalog.load_table(spark, "lineitem", SF_SMALL)
    plain = l.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("l_orderkey").alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    salted = skew.salted_groupby_agg(
        l,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "n": ("count", "l_orderkey"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    )
    assert_frames_match(salted.toPandas(), plain.toPandas())


def test_salted_join_matches_plain(spark):
    l = catalog.load_table(spark, "lineitem", SF_SMALL).select("l_orderkey", "l_quantity")
    o = catalog.load_table(spark, "orders", SF_SMALL).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").groupBy("l_orderkey").count()
    salted = skew.salted_join(l, o, "l_orderkey").groupBy("l_orderkey").count()
    assert_frames_match(salted.toPandas(), plain.toPandas())


def test_nondecomposable_agg_rejected(spark):
    l = catalog.load_table(spark, "lineitem", SF_SMALL)
    try:
        skew.salted_groupby_agg(l, ["l_returnflag"], {"a": ("avg", "l_quantity")})
        raise AssertionError("avg must be rejected")
    except ValueError:
        pass


def test_salted_groupby_plan_shape(spark):
    """The mitigation must be visible in the physical plan: a deterministic
    xxhash64 salt and TWO aggregation exchanges (keys+salt, then keys)."""
    from ad_hoc_olap_query_processing_engine_spark.plans import physical_plan

    l = catalog.load_table(spark, "lineitem", SF_SMALL)
    salted = skew.salted_groupby_agg(
        l, keys=["l_returnflag"], aggs={"sum_qty": ("sum", "l_quantity")}
    )
    plan = physical_plan(salted)
    assert "xxhash64" in plan
    exchanges = [
        seg for seg in plan.split("Arguments: ") if seg.startswith("hashpartitioning")
    ]
    assert len(exchanges) >= 2
    # the FIRST (pre-aggregation) shuffle must key on the salt as well
    assert any("__salt" in seg.splitlines()[0] for seg in exchanges)


def test_salted_join_plan_shape(spark):
    """The join must key on (key, __salt) — one hot key spreads over
    salt_buckets tasks — and must not silently broadcast the salted side."""
    from ad_hoc_olap_query_processing_engine_spark.plans import physical_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = catalog.load_table(spark, "lineitem", SF_SMALL)
        small = catalog.load_table(spark, "part", SF_SMALL).select(
            F.col("p_partkey").alias("l_partkey"), "p_brand"
        )
        joined = skew.salted_join(big, small, key="l_partkey")
        plan = physical_plan(joined)
        assert "__salt" in plan and "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_ops_match_plain_on_adversarial_skew(spark):
    """One key holding ~90% of rows (the case salting exists for): both
    hatches must still be result-identical to the unsalted plans."""
    import pandas as pd

    rows = [(0, i % 7) for i in range(9000)] + [(k, k) for k in range(1, 1000)]
    big = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    plain_agg = big.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("n")
    )
    salted_agg = skew.salted_groupby_agg(
        big, keys=["k"], aggs={"s": ("sum", "v"), "n": ("count", "v")}
    )
    assert_frames_match(salted_agg.toPandas(), plain_agg.toPandas())

    small = spark.createDataFrame(
        pd.DataFrame({"k": range(0, 1000), "tag": [f"t{i}" for i in range(1000)]})
    )
    plain_join = big.join(small, "k").groupBy("tag").count()
    salted_join = skew.salted_join(big, small, "k").groupBy("tag").count()
    assert_frames_match(salted_join.toPandas(), plain_join.toPandas())
