"""Skew-mitigation primitives (100 TB concerns made explicit).

AQE's skew-join splitting handles moderate join skew automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py). These helpers cover
the cases AQE does not:

salted_groupby_agg   two-phase aggregation for heavily-skewed GROUP BY keys:
                     salt the key (deterministic hash of the full tuple, not
                     rand() — keeps results reproducible), partial-aggregate
                     per (key, salt), then final-aggregate per key. Turns one
                     hot reducer into ``salt_buckets`` parallel ones. Only
                     algebraic aggregates decompose; this exposes
                     sum/count/min/max (avg = sum/count at the call site).

salted_join          hot-key-split join for when the small side is too big to
                     broadcast but the key histogram is spiked. A tiny
                     aggregate over the big side finds keys at/above
                     ``hot_threshold`` rows; ONLY those keys are salted (big
                     rows get a deterministic salt, matching small rows are
                     replicated once per salt value), every other key takes
                     the plain shuffle join. Replication volume is
                     salt_buckets × |hot-key rows of small|, not
                     salt_buckets × |small| — the difference between a
                     constant-factor fix and an 8× shuffle blow-up at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """``aggs``: output_name -> (fn, src_col), fn in sum/count/min/max.

    Equivalent to ``df.groupBy(keys).agg(...)`` but resistant to a single
    dominant key: stage 1 aggregates on (keys + salt), stage 2 merges.
    """
    for name, (fn, _src) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: {fn} does not decompose under salting")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _DECOMPOSABLE[fn](F.col(src)).alias(f"__p_{name}")
                for name, (fn, src) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, src) in aggs.items()
        ]
    )


def hot_keys(big: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Single-column DataFrame of ``key`` values holding >= hot_threshold rows
    in ``big``. groupBy+count does map-side partial aggregation, so the shuffle
    carries one row per distinct key, and the survivors are by definition few
    (a key only qualifies by owning a huge row share) — safe to broadcast."""
    return (
        big.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__key_rows"))
        .where(F.col("__key_rows") >= hot_threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Inner equi-join where ``big[key]`` may be heavily skewed and ``small``
    is too large to broadcast.

    Hot-key split: keys with >= ``hot_threshold`` rows in ``big`` are salted —
    their big rows get a deterministic salt in [0, salt_buckets) (hash of the
    full row, not rand(), so results are reproducible) and their small rows
    are replicated once per salt value, spreading each hot key over
    salt_buckets tasks. All other keys take the ordinary shuffle join with no
    replication and no extra exchange. The two branches are disjoint by
    construction (a key is either hot or not), so the union is exactly the
    plain join's result.
    """
    hot = hot_keys(big, key, hot_threshold)

    # Membership via broadcast left-semi/anti: no shuffle of big or small
    # beyond what the joins below need anyway.
    big_hot = big.join(F.broadcast(hot), key, "left_semi")
    big_cold = big.join(F.broadcast(hot), key, "left_anti")
    small_hot = small.join(F.broadcast(hot), key, "left_semi")

    cold_out = big_cold.join(small, key)

    big_salted = big_hot.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int"),
    )
    small_salted = small_hot.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hot_out = big_salted.join(small_salted, [key, "__salt"]).drop("__salt")

    return cold_out.unionByName(hot_out)
