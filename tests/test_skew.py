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
    """The hot branch must key on (key, __salt) — one hot key spreads over
    salt_buckets tasks — and neither data side may be silently broadcast
    (only the tiny hot-key set is; its broadcast is semi/anti membership)."""
    from ad_hoc_olap_query_processing_engine_spark.plans import physical_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = catalog.load_table(spark, "lineitem", SF_SMALL)
        small = catalog.load_table(spark, "part", SF_SMALL).select(
            F.col("p_partkey").alias("l_partkey"), "p_brand"
        )
        joined = skew.salted_join(big, small, key="l_partkey", hot_threshold=2)
        plan = physical_plan(joined)
        # hot branch: shuffle join keyed on the salt, replication via explode
        assert "__salt" in plan and "explode" in plan
        salted_exchanges = [
            seg
            for seg in plan.split("Arguments: ")
            if seg.startswith("hashpartitioning") and "__salt" in seg.splitlines()[0]
        ]
        assert salted_exchanges, "hot-branch join must shuffle on (key, __salt)"
        # the only broadcasts are the hot-key membership probes (semi/anti),
        # never a data-carrying inner join of small. Tree lines carry the
        # join type inline ("BroadcastHashJoin LeftSemi BuildRight (6)");
        # detail headers ("(6) BroadcastHashJoin") don't and are skipped.
        tree_joins = [
            line
            for line in plan.splitlines()
            if "BroadcastHashJoin" in line and not line.strip().startswith("(")
        ]
        assert tree_joins, "membership probes should broadcast the hot-key set"
        for line in tree_joins:
            assert "LeftSemi" in line or "LeftAnti" in line, line
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_hot_key_split_routing(spark):
    """Rows must route by key temperature: with a 90%-hot key, the hot-key
    set contains exactly that key, the cold branch join never sees it, and
    only the hot key's small-side rows are replicated."""
    import pandas as pd

    rows = [(0, i % 7) for i in range(9000)] + [(k, k) for k in range(1, 1000)]
    big = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    small = spark.createDataFrame(
        pd.DataFrame({"k": range(0, 1000), "tag": [f"t{i}" for i in range(1000)]})
    )

    hot = skew.hot_keys(big, "k", hot_threshold=1000)
    assert [r.k for r in hot.collect()] == [0]

    # replication volume: salt_buckets × |hot rows of small| = 8 × 1, not 8 × 1000
    small_hot = small.join(F.broadcast(hot), "k", "left_semi")
    replicated = small_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(7)))
    )
    assert replicated.count() == 8

    # cold branch excludes the hot key entirely
    big_cold = big.join(F.broadcast(hot), "k", "left_anti")
    assert big_cold.where(F.col("k") == 0).count() == 0
    assert big_cold.count() == 999


def test_salted_join_no_hot_keys_degenerates_to_plain(spark):
    """With nothing above threshold the hot branch carries zero rows and the
    result is exactly the plain join (uniform keys must not pay replication)."""
    import pandas as pd

    big = spark.createDataFrame(
        pd.DataFrame({"k": [i % 50 for i in range(2000)], "v": range(2000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": range(50), "tag": [f"t{i}" for i in range(50)]})
    )
    assert skew.hot_keys(big, "k", hot_threshold=1000).count() == 0
    plain = big.join(small, "k").groupBy("tag").count()
    salted = skew.salted_join(big, small, "k", hot_threshold=1000).groupBy("tag").count()
    assert_frames_match(salted.toPandas(), plain.toPandas())


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
    salted_join = (
        skew.salted_join(big, small, "k", hot_threshold=1000).groupBy("tag").count()
    )
    assert_frames_match(salted_join.toPandas(), plain_join.toPandas())


def test_aqe_native_skew_join_splits_hot_partition(spark):
    """The manual salting hatches above are for when the engine can't help;
    this pins that the SESSION'S OWN config (adaptive.skewJoin.enabled in
    session.py) actually fires: with the size thresholds scaled down to
    local data volumes, AQE must mark the hot partition skew=true in the
    executed SortMergeJoin and split it — the Spark-native path that handles
    moderate skew before anyone reaches for a salting hatch."""
    import pyspark.sql.functions as F

    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        [row] = j.collect()
        assert row.n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
