"""Layout-maintenance jobs: compaction must preserve rows while cutting file
count; Z-order must narrow parquet row-group min/max ranges on EVERY z
dimension (the footer-stats skipping a 100 TB scan relies on)."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ad_hoc_olap_query_processing_engine_spark.sources import catalog, layout

from .conftest import SF_SMALL


def _data_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_compact_small_files_preserves_rows(spark):
    d = catalog.load_table(spark, "documents", SF_SMALL)
    with tempfile.TemporaryDirectory() as tmp:
        frag = os.path.join(tmp, "fragmented")
        d.repartition(20).write.parquet(frag)
        assert len(_data_files(frag)) == 20
        out = os.path.join(tmp, "compacted")
        layout.compact_small_files(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
        files = _data_files(out)
        assert len(files) < 20
        back = spark.read.parquet(out)
        assert back.count() == d.count()
        assert (
            back.agg(F.sum("doc_id")).first()[0] == d.agg(F.sum("doc_id")).first()[0]
        )


def test_compact_swap_is_atomic_on_existing_target(spark):
    d = catalog.load_table(spark, "nation", SF_SMALL)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        d.repartition(5).write.parquet(src)
        out = os.path.join(tmp, "out")
        layout.compact_small_files(spark, src, out)
        first = spark.read.parquet(out).count()
        layout.compact_small_files(spark, src, out)  # re-run over existing dir
        assert spark.read.parquet(out).count() == first
        assert not os.path.isdir(out + "._compacting")


def _avg_rg_span(path: str, col: str) -> float:
    """Mean (max-min) range of ``col`` across all row groups of all files."""
    spans = []
    for f in _data_files(path):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
    return sum(spans) / len(spans)


def test_zorder_narrows_rowgroup_stats_on_both_dimensions(spark):
    li = catalog.load_table(spark, "lineitem", SF_SMALL).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    with tempfile.TemporaryDirectory() as tmp:
        base = os.path.join(tmp, "by_orderkey")
        zord = os.path.join(tmp, "zordered")
        # baseline: single-column clustering (what a plain sort gives you)
        li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
            "l_orderkey"
        ).write.parquet(base)
        layout.write_zordered(li, zord, ["l_orderkey", "l_partkey"], n_files=8)

        # same rows either way
        assert spark.read.parquet(zord).count() == li.count()

        # the baseline is perfectly clustered on its sort column but leaves
        # the second dimension at full-domain spans; z-order must cut the
        # second dimension's span substantially while keeping the first far
        # below full domain
        base_pk = _avg_rg_span(base, "l_partkey")
        z_pk = _avg_rg_span(zord, "l_partkey")
        z_ok = _avg_rg_span(zord, "l_orderkey")
        full_ok = _avg_rg_span(os.path.join(SF_SMALL, "lineitem.parquet"), "l_orderkey")
        assert z_pk < base_pk * 0.6, (z_pk, base_pk)
        assert z_ok < full_ok * 0.6, (z_ok, full_ok)


def test_zorder_quantile_scaling_balances_skewed_domains(spark):
    """On a power-law column, min-max scaling crams most rows into a few
    rank buckets (the outlier stretches the domain); quantile scaling keeps
    bucket occupancy near-uniform, so every z-prefix splits the data evenly."""
    rows = spark.range(4000).select(
        F.col("id").alias("k"),
        # heavy skew: 99% of values in [0, 100), a few huge outliers
        F.when(F.col("id") % 100 == 0, F.col("id") * 1000)
        .otherwise(F.col("id") % 100)
        .alias("v"),
    )
    mm = layout.with_zorder_key(rows, ["v", "k"], bits=4, scaling="minmax")
    qt = layout.with_zorder_key(rows, ["v", "k"], bits=4, scaling="quantile")

    def max_bucket_frac(df):
        # recover the v-dimension rank: v's bits sit at even positions of the
        # 2-way interleave (0, 2, 4, 6 for bits=4)
        v_rank = sum(
            (F.shiftright("__z", 2 * b).bitwiseAND(1) * (1 << b) for b in range(4)),
            F.lit(0),
        )
        counts = df.groupBy(v_rank.alias("b")).count().collect()
        total = sum(r["count"] for r in counts)
        return max(r["count"] for r in counts) / total

    # both keys cover all rows
    assert mm.count() == qt.count() == 4000
    assert max_bucket_frac(qt) < 0.5 < max_bucket_frac(mm)


def test_recover_layout_restores_after_mid_swap_crash(spark, tmp_path):
    """Simulated compactor death between the two renames: the table path is
    gone, old data sits at ._old — recovery must put it back untouched."""
    from ad_hoc_olap_query_processing_engine_spark.sources import layout

    table = str(tmp_path / "t")
    spark.range(100).write.parquet(table)
    # crash state: table renamed away, half-written new output stranded
    os.replace(table, table + "._old")
    os.makedirs(table + "._compacting")
    assert layout.recover_layout(table) == "restored_old"
    assert spark.read.parquet(table).count() == 100
    assert not os.path.isdir(table + "._old")
    assert not os.path.isdir(table + "._compacting")


def test_recover_layout_cleans_residue_and_reports_clean(spark, tmp_path):
    from ad_hoc_olap_query_processing_engine_spark.sources import layout

    table = str(tmp_path / "t")
    spark.range(10).write.parquet(table)
    assert layout.recover_layout(table) == "clean"
    os.makedirs(table + "._old")
    assert layout.recover_layout(table) == "cleaned_residue"
    assert spark.read.parquet(table).count() == 10
    assert layout.recover_layout(str(tmp_path / "never_existed")) == "missing"
