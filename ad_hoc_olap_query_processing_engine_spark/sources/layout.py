"""Table-layout maintenance: the jobs a 100 TB parquet warehouse runs to keep
scans fast (the reference has no notion of layout — its one table lives in
PostgreSQL; reference: src/QueryProcessor1.java:76-96 full-scans it).

compact_small_files   the OPTIMIZE/compaction job: streaming and per-trigger
                      batch writers leave thousands of KB-sized files; each
                      costs an open + footer parse per scan task. Rewrite a
                      directory into ~target-sized files. File count is
                      computed from the on-disk byte size (driver-side
                      listing, no data read); the rewrite is one coalesce-
                      free repartition so rows distribute evenly regardless
                      of input skew. Two-phase: write to a temp dir, then a
                      crash-RECOVERABLE two-rename swap (never partial data;
                      a reader racing the swap window can still see the path
                      briefly absent — true atomicity needs a metastore or
                      symlink flip, as noted inline).

zorder_key            multi-dimensional clustering: interleave the bits of
                      several int columns into one sort key so that sorting
                      by the key makes row-group min/max ranges NARROW ON
                      EVERY dimension at once (a plain sort only helps its
                      leading column). Scans filtering on ANY of the z
                      columns then skip most row groups via footer stats —
                      the same reason Delta/Iceberg expose OPTIMIZE ZORDER.
                      Pure JVM bit arithmetic (shiftright/and/shiftleft)
                      over scaled values. Two scalings: LINEAR MIN-MAX
                      (per-column min/max from a tiny aggregate; ntile was
                      rejected — its global rank is a single-partition sort
                      at scale) and APPROX-QUANTILE rank (Greenwald-Khanna
                      cut points, near-uniform bucket occupancy under
                      domain skew).

write_zordered        repartitionByRange(z) + sortWithinPartitions(z) +
                      parquet write: range partitioning gives global
                      clustering (each file owns a z-range), the local sort
                      orders rows inside row groups.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution: 2^16 rank buckets


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` (parquet dir) into ``out_path`` with files sized
    ~``target_file_bytes``. Returns the output file count."""
    n_files = max(1, -(-dir_bytes(in_path) // target_file_bytes))  # ceil
    tmp = out_path.rstrip("/") + "._compacting"
    (
        spark.read.parquet(in_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # swap via two renames, never rmtree-then-rename: a crash between the
    # renames leaves the old data at ._old (recoverable), not deleted with
    # the new data stranded. On an object store this whole step becomes a
    # metastore location flip, which is where true atomicity lives.
    if os.path.isdir(out_path):
        old = out_path.rstrip("/") + "._old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.replace(out_path, old)
        os.replace(tmp, out_path)
        shutil.rmtree(old)
    else:
        os.replace(tmp, out_path)
    return n_files


def _zorder_interleave(ranks: list[Column], bits: int) -> Column:
    n = len(ranks)
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for d, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + d)
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = Z_BITS,
    key_col: str = "__z",
    scaling: str = "minmax",
) -> DataFrame:
    """Attach an interleaved-bit (Morton) key over normalized dimensions.

    ``scaling="minmax"`` (default): bounds come from ONE tiny aggregate
    broadcast onto the scan — no global window/sort anywhere (an ntile-based
    rank normalization would funnel the whole table through one window
    partition). Linear scaling wastes bit space under heavy value-domain
    skew.

    ``scaling="quantile"``: per-dimension approx-quantile cut points
    (Greenwald-Khanna sketch — one distributed pass, driver gets the tiny
    cut-point list; acceptable here because layout maintenance is a JOB, not
    a query path). Each value's rank is its bucket among the cut points, so
    bucket occupancy is near-uniform regardless of domain skew and every
    z-prefix splits the data evenly. Per-dimension resolution caps at 2^10
    buckets in this mode (the sketch, not the interleave, is the limit).

    Either way the interleave is identical: bits round-robin so every
    dimension contributes equally at every prefix length of the key."""
    # keep every interleaved shift index inside a signed 64-bit key: with n
    # dimensions the top bit lands at bits*n - 1, so cap per-dimension bits
    # at 62//n instead of silently wrapping into the sign bit
    bits = min(bits, 62 // max(len(cols), 1))
    if scaling == "quantile":
        return _with_zorder_key_quantile(df, cols, min(bits, 10), key_col)
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    keyed = df.crossJoin(F.broadcast(bounds))
    top = F.lit((1 << bits) - 1)
    ranks = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        ranks.append(
            F.least(
                top, F.floor((F.col(c).cast("double") - lo) / span * (1 << bits))
            ).cast("bigint")
        )
    return keyed.withColumn(key_col, _zorder_interleave(ranks, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def _with_zorder_key_quantile(
    df: DataFrame, cols: list[str], bits: int, key_col: str
) -> DataFrame:
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    casted = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    all_cuts = casted.stat.approxQuantile(cols, probs, 1.0 / (4 * n_buckets))
    ranks = []
    for c, cuts in zip(cols, all_cuts):
        # dedupe (heavy ties collapse cut points) and keep order; rank =
        # number of cut points <= value, evaluated by a JVM higher-order
        # fold over the literal cut array — O(buckets) per row, no join
        uniq = sorted(set(cuts))
        cut_arr = F.array(*[F.lit(float(x)) for x in uniq])
        ranks.append(
            F.aggregate(
                cut_arr,
                F.lit(0).cast("bigint"),
                lambda acc, cut: acc
                + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
            )
        )
    return df.withColumn(key_col, _zorder_interleave(ranks, bits))


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, scaling: str = "minmax"
) -> None:
    keyed = with_zorder_key(df, cols, scaling=scaling)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def recover_layout(out_path: str) -> str:
    """Crash-recovery sweep for ``compact_small_files``'s two-rename swap —
    run this before reading a table whose compactor may have died:

    - table present: any ``._old`` / ``._compacting`` residue is garbage
      from a crash AFTER the new data landed (or mid-write) → remove it.
    - table ABSENT but ``._old`` present: the compactor died between the
      two renames → restore ``._old`` to the table path (old data is intact
      by construction; the half-swapped ``._compacting`` output is dropped).
    - table absent and no ``._old``: nothing to recover.

    Returns one of ``"clean"``, ``"cleaned_residue"``, ``"restored_old"``,
    ``"missing"`` so operators can log what happened. This is the recovery
    half of the crash-recoverable contract documented on
    ``compact_small_files``; on an object store the same logic runs against
    the metastore's location pointer instead of directory renames."""
    base = out_path.rstrip("/")
    old = base + "._old"
    tmp = base + "._compacting"
    if os.path.isdir(base):
        residue = False
        for p in (old, tmp):
            if os.path.isdir(p):
                shutil.rmtree(p)
                residue = True
        return "cleaned_residue" if residue else "clean"
    if os.path.isdir(old):
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.replace(old, base)
        return "restored_old"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    return "missing"
