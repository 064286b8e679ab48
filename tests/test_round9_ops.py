"""Semantic pins for the round-9 operators (beyond the oracle hash-equality
the driver enforces): the count-min overestimate guarantee, the U-shaped
attribution conservation law, epoch-shuffle permutation coverage, novelty
bounds, edit-distance ground truth, lag-feature windows, and chunk-manifest
byte conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ad_hoc_olap_query_processing_engine_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    sketches,
    text,
    timeseries,
)
from ad_hoc_olap_query_processing_engine_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def test_countmin_never_underestimates(spark):
    out = sketches.func_countmin_sketch(spark, SF_SMALL).toPandas()
    assert len(out) == sketches.CMS_TOP
    # the count-min guarantee: estimates are exact-or-over, never under
    assert (out.overcount_n >= 0).all()
    assert (out.est_n >= out.true_n).all()


def test_position_attribution_conserves_credit(spark):
    out = timeseries.rel_position_attribution(spark, SF_SMALL).toPandas()
    # every purchase with >= 1 prior touch hands out exactly 10000 bps
    e = load_table(spark, "events", SF_SMALL).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("us").alias("pus"),
    )
    touched = (
        e.join(
            p,
            (F.col("user_id") == F.col("puser"))
            & (F.col("us") < F.col("pus"))
            & (F.col("us") >= F.col("pus") - timeseries.ATTR_WINDOW_US),
        )
        .select("pid")
        .distinct()
        .count()
    )
    assert touched > 0
    assert int(out.credit_bps_total.sum()) == 10000 * touched


def test_position_attribution_formula_sums_to_10000():
    # the bps CASE ladder, mirrored in pure Python: conservation for every n
    for n in range(1, 60):
        credits = []
        for i in range(n):
            if n == 1:
                credits.append(10000)
            elif n == 2:
                credits.append(5000)
            elif i == 0 or i == n - 1:
                credits.append(4000)
            else:
                credits.append(2000 // (n - 2) + (1 if i - 1 < 2000 % (n - 2) else 0))
        assert sum(credits) == 10000, n


def test_epoch_shuffle_covers_corpus_and_differs_across_epochs(spark):
    out = pipeline.pipe_epoch_shuffle(spark, SF_SMALL).toPandas()
    n_docs = load_table(spark, "documents", SF_SMALL).count()
    per_epoch = out.groupby("epoch")["n_docs"].sum()
    assert (per_epoch == n_docs).all()  # every epoch is a full permutation
    # the permutations genuinely differ: some bucket's membership changes
    a = out[out.epoch == 0].set_index("bucket")[["n_docs", "xor_doc_ids"]]
    b = out[out.epoch == 1].set_index("bucket")[["n_docs", "xor_doc_ids"]]
    joined = a.join(b, lsuffix="_a", rsuffix="_b", how="outer")
    assert not joined["n_docs_a"].equals(joined["n_docs_b"]) or not joined[
        "xor_doc_ids_a"
    ].equals(joined["xor_doc_ids_b"])


def test_ngram_novelty_bounds(spark):
    out = text.text_ngram_novelty(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    assert (out.unique_shingles <= out.total_shingles).all()
    assert ((out.novelty_bps >= 0) & (out.novelty_bps <= 10000)).all()
    assert (out.n_memorized_docs <= out.n_docs).all()


def test_edit_distance_matches_reference_dp(spark):
    out = dedup.dedup_edit_distance(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    assert ((out.dist_bps >= 0) & (out.dist_bps <= 10000)).all()
    docs = {
        r.doc_id: (r.text or "")[: dedup.EDIT_PREFIX]
        for r in load_table(spark, "documents", SF_SMALL)
        .select("doc_id", "text")
        .collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in out.head(5).itertuples():
        assert lev(docs[r.doc_a], docs[r.doc_b]) == r.edit_dist


def test_lag_features_windows(spark):
    out = timeseries.ts_lag_features(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    # the trailing-7d window includes the current day
    assert (out.trailing_7d_events >= out.n_events).all()
    # spot-check the calendar lag on one user with >= 2 consecutive days
    by_user = out.sort_values(["user_id", "d"]).groupby("user_id")
    checked = 0
    for _, g in by_user:
        rows = g.reset_index(drop=True)
        for i in range(1, len(rows)):
            if rows.d[i] == rows.d[i - 1] + 1:
                assert rows.prev_day_events[i] == rows.n_events[i - 1]
                checked += 1
            elif rows.d[i] > rows.d[i - 1] + 1:
                assert rows.prev_day_events[i] == 0
                checked += 1
        if checked > 50:
            break
    assert checked > 0


def test_chunk_manifest_conserves_bytes(spark):
    out = multimodal.mm_chunk_manifest(spark, SF_SMALL).toPandas()
    d = (
        load_table(spark, "documents", SF_SMALL)
        .select("doc_id", F.octet_length("text").alias("n_bytes"))
        .toPandas()
        .set_index("doc_id")["n_bytes"]
    )
    got = out.groupby("media_id")["chunk_len"].sum()
    for media_id, total in got.items():
        assert total == d[media_id]
    # chunk count parity and positive ragged tails
    assert (out.chunk_len > 0).all()
    got_chunks = (out.groupby("media_id")["chunk_idx"].max() + 1).astype("int64")
    declared = out.groupby("media_id")["n_chunks"].first().astype("int64")
    assert (got_chunks == declared).all()


def test_multimodal_ascii_contract(spark):
    """The multimodal tier's byte ops (mm_byte_stats, mm_chunk_manifest,
    mm_sig_* …) slice with CHARACTER functions (substring/substr) but size
    with BYTE functions (octet_length) — identical in both engines ONLY if
    the corpus is ASCII (1 char == 1 byte).  A non-ASCII document would make
    both engines wrong THE SAME WAY, so the driver hash check cannot catch
    it; this test pins the contract explicitly at every local SF dir."""
    from .conftest import SF_ORACLE

    for sf_dir in (SF_SMALL, SF_ORACLE, "/root/testdata/sf0.1"):
        bad = (
            load_table(spark, "documents", sf_dir)
            .filter(F.octet_length("text") != F.length("text"))
            .count()
        )
        assert bad == 0, f"non-ASCII documents at {sf_dir}: {bad}"
