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

salted_join          replicate the small side ``salt_buckets`` times and salt
                     the big side's key so one hot join key spreads over many
                     tasks. For when the small side is too big to broadcast
                     but the key histogram is spiked.
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join where ``big[key]`` is heavily skewed and ``small`` is
    too large to broadcast: big rows get a deterministic salt in
    [0, salt_buckets); small rows are replicated once per salt value."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"])
    return out.drop("__salt")
