"""bitmap_semi_join unit coverage: bit/block edge cases and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ad_hoc_olap_query_processing_engine_spark.operators.prefilter import (
    bitmap_semi_join,
    rel_bitmap_semi_join,
)
from ad_hoc_olap_query_processing_engine_spark.plans import has_broadcast_join

from .conftest import SF_SMALL


def test_bitmap_membership_exact_at_block_boundaries(spark):
    """Keys at word edges (0, 63, 64, 127, 128) must round-trip exactly —
    bit 63 exercises the sign bit of the BIGINT word, 64/128 the block
    split. Neighbours of members must NOT leak through (exactness: a bloom
    filter would admit false positives; the bitmap may not)."""
    keys = spark.createDataFrame([(k,) for k in [0, 63, 64, 127, 128, 1000]], "k bigint")
    fact = spark.range(0, 1200).select(F.col("id").alias("fk"))
    got = sorted(
        r.fk for r in bitmap_semi_join(fact, keys, "fk", "k").select("fk").collect()
    )
    assert got == [0, 63, 64, 127, 128, 1000]


def test_bitmap_semi_join_broadcasts_the_bitmap(spark):
    df = rel_bitmap_semi_join(spark, SF_SMALL)
    assert has_broadcast_join(df)


def test_bitmap_semi_join_equals_plain_semi_join_on_random_keys(spark):
    """Property: for arbitrary key sets (clustered, sparse, adjacent,
    boundary-straddling), the bitmap transport must select EXACTLY the rows
    a plain left-semi join selects."""
    import random

    rng = random.Random(42)
    for trial in range(5):
        keys = sorted(
            rng.sample(range(0, 5000), rng.randint(1, 400))
            + [0, 63, 64, 4999]  # force boundary coverage every trial
        )
        key_df = spark.createDataFrame([(k,) for k in set(keys)], "k bigint")
        fact = spark.range(0, 5000).select(F.col("id").alias("fk"))
        got = sorted(
            r.fk for r in bitmap_semi_join(fact, key_df, "fk", "k").select("fk").collect()
        )
        exp = sorted(
            r.fk
            for r in fact.join(
                key_df, fact["fk"] == key_df["k"], "left_semi"
            ).collect()
        )
        assert got == exp, f"trial {trial}: {len(got)} vs {len(exp)}"


def test_bitmap_membership_exact_for_negative_keys(spark):
    """Floor-based block/bit math must keep NEGATIVE keys exact: with
    truncating div/% the JVM masks the negative shift count and key -1
    collides with key 63 (a false positive)."""
    keys = spark.createDataFrame(
        [(k,) for k in [-130, -65, -64, -1, 0, 63]], "k bigint"
    )
    fact = spark.range(-200, 200).select(F.col("id").alias("fk"))
    got = sorted(
        r.fk for r in bitmap_semi_join(fact, keys, "fk", "k").select("fk").collect()
    )
    assert got == [-130, -65, -64, -1, 0, 63]


def test_bitmap_encoding_exact_at_extreme_keys(spark):
    """The shared 64-key block/bit encoding must match Python floor-div
    semantics for ANY int64 key — including ±2^53 (where a double-based
    FLOOR(key/64) loses exactness) and negative keys (where truncating
    div would produce a negative shift count the JVM masks)."""
    from pyspark.sql import functions as F

    from ad_hoc_olap_query_processing_engine_spark.operators.prefilter import (
        bitmap_blk_bit,
    )

    keys = [0, 1, 63, 64, -1, -64, -65, 2**53, 2**53 + 1, 2**62 - 1, -(2**62)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    blk, bit = bitmap_blk_bit("k")
    rows = df.select(
        "k", blk.alias("blk"), F.expr("CAST((k & 63) AS INT)").alias("bi"), bit.alias("mask")
    ).collect()
    for r in rows:
        assert (r.blk, r.bi) == (r.k // 64, r.k % 64), r
        # bit 63 is the sign bit: 1 << 63 wraps to -(2^63) in the JVM's int64
        expected = -(2**63) if r.k % 64 == 63 else 1 << (r.k % 64)
        assert r.mask == expected, r


def test_quantile_bucket_matches_duckdb_at_any_sign(spark):
    """func_quantile_rollup's Spark bucket expression must agree with the
    DuckDB oracle's integer `//` at every sign.  Both engines TRUNCATE
    integer division toward zero (DuckDB: -501 // 500 = -1, same as Spark
    DIV), so the pin runs the identical values through an embedded DuckDB —
    not Python's flooring `//`, which disagrees for negatives."""
    import duckdb

    from ad_hoc_olap_query_processing_engine_spark.operators.sketches import QR_W

    vals = [-1001, -500, -499, -1, 0, 1, 499, 500, 1001]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select("v", F.expr(f"v DIV {QR_W}").alias("bkt")).collect()
    spark_bkt = {r.v: r.bkt for r in rows}
    duck = dict(
        duckdb.sql(
            f"SELECT v, v // {QR_W} FROM (VALUES "
            + ", ".join(f"({v}::BIGINT)" for v in vals)
            + ") t(v)"
        ).fetchall()
    )
    assert spark_bkt == duck, (spark_bkt, duck)
    # pin the semantics themselves: truncation, not floor
    assert duck[-1] == 0 and duck[-1001] == -2 and duck[-500] == -1
