"""Round-13 pins.

1. Session-cache eviction actually frees localCheckpoint blocks (verdict
   r12 #3): ``DataFrame.unpersist`` alone does not reach checkpoint blocks
   (they bypass the Dataset cache manager), so ``session_cache`` eviction
   must unpersist the underlying LogicalRDD's RDD.
2. ``_corpus_is_big`` degrades to the scale-safe big plan on a CORRUPT
   parquet footer (ADVICE r12: ArrowInvalid subclasses ValueError, not
   OSError).
3. Pair-fingerprint halves hash structurally different payloads (ADVICE
   r12): the rewrite must not change pair/verify row semantics.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _persisted_rdd_ids(spark) -> set[int]:
    """IDs of RDDs currently holding storage blocks (block-manager view —
    sees both cache-manager blocks AND localCheckpoint blocks)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        infos[i].id()
        for i in range(len(infos))
        if infos[i].numCachedPartitions() > 0
    }


def _checkpoint_rdd_id(df) -> int:
    """ID of the PERSISTED ancestor RDD holding the checkpoint blocks (the
    LogicalRDD leaf usually wraps a deserializer RDD one hop above it)."""
    plan = df._jdf.queryExecution().analyzed()
    leaves = plan.collectLeaves()
    frontier = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() == "LogicalRDD":
            frontier.append(leaf.rdd())
    assert frontier, "no LogicalRDD leaf — not a checkpointed frame"
    for _ in range(16):
        nxt = []
        for rdd in frontier:
            if rdd.getStorageLevel().isValid():
                return rdd.id()
            deps = rdd.dependencies()
            for j in range(deps.size()):
                nxt.append(deps.apply(j).rdd())
        if not nxt:
            break
        frontier = nxt
    raise AssertionError("no persisted ancestor found")


class TestSessionCacheEviction:
    def _build_ckpt(self, spark, tag: str):
        from ad_hoc_olap_query_processing_engine_spark.operators.iterutil import (
            truncated_checkpoint,
        )

        df = spark.range(100).withColumn("tag", F.lit(tag))
        return truncated_checkpoint(df)

    def test_unpersist_alone_does_not_free_checkpoint_blocks(self, spark):
        """The bug's premise, pinned so a Spark version that fixes it
        surfaces here instead of silently changing semantics."""
        df = self._build_ckpt(spark, "premise")
        rid = _checkpoint_rdd_id(df)
        assert rid in _persisted_rdd_ids(spark)
        df.unpersist()
        assert rid in _persisted_rdd_ids(spark), (
            "DataFrame.unpersist released localCheckpoint blocks — the "
            "session_cache plan-walk release is now redundant; revisit"
        )
        # clean up for the following tests
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        session_cache.release_blocks(df)
        assert rid not in _persisted_rdd_ids(spark)

    def test_lru_eviction_frees_checkpoint_blocks(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        name = "__test_r13_evict"
        session_cache.invalidate(name)
        built = {}
        try:
            for i in range(session_cache.MAX_SF_DIRS_PER_NAME + 1):
                sf_dir = f"/tmp/__r13_sf_{i}"
                df = session_cache.session_cached(
                    name, spark, sf_dir,
                    lambda i=i: self._build_ckpt(spark, f"sf{i}"),
                )
                built[sf_dir] = _checkpoint_rdd_id(df)
            live = _persisted_rdd_ids(spark)
            evicted_id = built["/tmp/__r13_sf_0"]
            assert evicted_id not in live, (
                "LRU-evicted checkpoint artifact still holds blocks"
            )
            for i in range(1, session_cache.MAX_SF_DIRS_PER_NAME + 1):
                assert built[f"/tmp/__r13_sf_{i}"] in live
        finally:
            session_cache.invalidate(name)
        assert not (set(built.values()) & _persisted_rdd_ids(spark))

    def test_invalidate_frees_checkpoint_blocks_and_runs_release(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        name = "__test_r13_invalidate"
        session_cache.invalidate(name)
        called = []
        df = session_cache.session_cached(
            name, spark, "/tmp/__r13_sf_x",
            lambda: self._build_ckpt(spark, "x"),
            release=lambda: called.append(True),
        )
        rid = _checkpoint_rdd_id(df)
        assert rid in _persisted_rdd_ids(spark)
        session_cache.invalidate(name)
        assert called == [True], "explicit release callback did not run"
        assert rid not in _persisted_rdd_ids(spark)

    def test_plain_persist_entries_still_released(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        name = "__test_r13_persist"
        session_cache.invalidate(name)
        df = session_cache.session_cached(
            name, spark, "/tmp/__r13_sf_p",
            lambda: spark.range(50).persist(),
        )
        df.count()
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
        session_cache.invalidate(name)
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


class TestCorpusIsBigFooter:
    def test_corrupt_footer_defaults_big(self, tmp_path):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            _corpus_is_big,
        )

        # a truncated/garbage footer raises pyarrow.ArrowInvalid
        # (subclasses ValueError) — must degrade to the big plan, not crash
        (tmp_path / "documents.parquet").write_bytes(b"PAR1garbagePAR1")
        assert _corpus_is_big(str(tmp_path)) is True

    def test_missing_file_defaults_big(self, tmp_path):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            _corpus_is_big,
        )

        assert _corpus_is_big(str(tmp_path / "nope")) is True

    def test_small_corpus_detected(self):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            _corpus_is_big,
        )

        assert _corpus_is_big(SF) is False


class TestFingerprintHalves:
    def test_halves_differ_and_are_not_seed_variants(self, spark):
        """h1 and h2 must hash different byte streams: for a single-element
        set, reversed order equals forward order, so assert on a
        multi-element set where the payloads genuinely differ; and the salt
        keeps even the single-element halves distinct."""
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            _set_fingerprints,
        )

        sh = spark.createDataFrame(
            [(1, "aa"), (1, "bb"), (1, "cc"), (2, "aa")],
            ["doc_id", "s"],
        )
        fp = _set_fingerprints(sh).select("doc_id", "__fp.h1", "__fp.h2")
        rows = {r["doc_id"]: (r["h1"], r["h2"]) for r in fp.collect()}
        assert rows[1][0] != rows[1][1]
        assert rows[2][0] != rows[2][1]
        assert rows[1] != rows[2]

    def test_fingerprint_rewrite_preserves_pair_semantics(self, spark):
        """Distinct shingle sets get distinct fingerprints; identical sets
        collide (the whole point) — pinned across the h2 re-derivation."""
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            _set_fingerprints,
        )

        rows = [
            (1, ["x", "y", "z"]),
            (2, ["x", "y", "z"]),   # same set as 1 -> same fp
            (3, ["z", "y", "x"]),   # same SET (order irrelevant pre-sort)
            (4, ["x", "y"]),        # different set -> different fp
        ]
        sh = spark.createDataFrame(rows, ["doc_id", "els"]).select(
            "doc_id", F.explode("els").alias("s")
        )
        fp = {
            r["doc_id"]: (r["__fp"]["h1"], r["__fp"]["h2"])
            for r in _set_fingerprints(sh).collect()
        }
        assert fp[1] == fp[2] == fp[3]
        assert fp[4] != fp[1]


class TestMinhashIncremental:
    """pipe_minhash_incremental (round 13, verdict r12 #7): CDC-fed pair
    maintenance must equal a from-scratch rebuild, touching only the
    delta."""

    def test_incremental_equals_full_recompute(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            dedup_minhash_lsh,
        )
        from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
            pipe_minhash_incremental,
        )

        inc = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in pipe_minhash_incremental(spark, SF).collect()
        }
        full = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup_minhash_lsh(spark, SF).collect()
        }
        assert inc == full
        assert len(inc) > 0

    def test_delta_stage_touches_only_dirty_buckets(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            pipeline,
            session_cache,
        )

        pins = []
        frames = pipeline._incr_delta_frames(spark, SF, pins=pins)
        try:
            base_bands = pipeline._incr_base_bands(spark, SF).count()
            dirty_members = frames["dirty_members"].count()
            # the windowed recompute sees dirty-bucket members only — a
            # small fraction of the full band index, bounded by the batch's
            # bucket fan-out (each delta doc dirties at most BANDS buckets)
            assert dirty_members < base_bands / 2
            # every freshly verified pair involves a delta document: clean
            # buckets are never re-paired, and adding members to a sorted
            # neighborhood never creates new base-base pairs
            fresh = frames["fresh_verified"].collect()
            assert all(
                r.doc_a % pipeline.DELTA_MOD == 0
                or r.doc_b % pipeline.DELTA_MOD == 0
                for r in fresh
            )
            assert len(fresh) > 0
        finally:
            for df in pins:
                session_cache.release_blocks(df)
            # round 14: the verified fresh-pair leg comes back checkpointed
            # and unpinned (adopted by the callers) — release it here too
            session_cache.release_blocks(frames["fresh_verified"])

    def test_batch_working_set_released(self, spark):
        """The registered query materializes the batch working set and must
        release its blocks once the refreshed pair table is cached."""
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            pipeline,
            session_cache,
        )

        session_cache.invalidate("mh_incr_pairs")
        before = _persisted_rdd_ids(spark)
        df = pipeline.pipe_minhash_incremental(spark, SF)
        df.count()
        after = _persisted_rdd_ids(spark)
        # exactly the cached result artifact (and any base artifacts built
        # lazily) may remain — the _pin() checkpoints of the build
        # (delta_bands, cand_dirty, fresh, …) must be gone; they are
        # |batch|-sized frames with single-digit partition counts, so bound
        # the growth instead of fingerprinting ids: the result's two
        # checkpointed legs (kept + fresh, round 14) + 3 base artifacts
        assert len(after - before) <= 5


class TestCcIncremental:
    """pipe_cc_incremental (round 13): incremental cluster-label maintenance
    must equal CC from scratch over the refreshed pair table, and its
    iterative recompute must touch only affected-component edges."""

    def test_incremental_equals_full_recompute(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            dedup_cluster_cc,
        )
        from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
            pipe_cc_incremental,
        )

        inc = {
            (r.doc_id, r.cluster_id, r.is_keeper, r.cluster_size)
            for r in pipe_cc_incremental(spark, SF).collect()
        }
        full = {
            (r.doc_id, r.cluster_id, r.is_keeper, r.cluster_size)
            for r in dedup_cluster_cc(spark, SF).collect()
        }
        assert inc == full
        assert len(inc) > 0

    def test_loop_runs_on_affected_subgraph_only(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import pipeline

        # count the refreshed table BEFORE building the frames: round 14's
        # invalidate-first refresh releases the previous store generation on
        # every pipe_minhash_incremental call, so frames built against one
        # generation must not be read across a later call
        refreshed = pipeline.pipe_minhash_incremental(spark, SF).count()
        frames = pipeline._cc_incremental_frames(spark, SF)
        sub = frames["sub"].count()
        # the loop input is a strict subset of the refreshed graph: clean
        # components (which exist at every sf — DELTA_MOD leaves most dup
        # groups untouched) contribute kept labels, not edges
        assert 0 < sub < refreshed
        assert frames["kept_lab"].count() > 0
        # the kept labels and the recomputed subgraph are vertex-disjoint
        # (the union would otherwise double-label a doc)
        sub_nodes = (
            frames["sub"]
            .selectExpr("doc_a AS doc_id")
            .union(frames["sub"].selectExpr("doc_b AS doc_id"))
            .distinct()
        )
        overlap = frames["kept_lab"].join(sub_nodes, "doc_id", "left_semi").count()
        assert overlap == 0

    def test_affected_set_is_one_hop(self, spark):
        """A = old labels of delta-edge endpoints; every affected label must
        be a real base label (no transitive expansion, no phantom ids)."""
        from ad_hoc_olap_query_processing_engine_spark.operators import pipeline

        frames = pipeline._cc_incremental_frames(spark, SF)
        l0 = pipeline._incr_base_cc(spark, SF)
        phantom = (
            frames["affected"]
            .join(
                l0.select(F.col("cluster_id").alias("__al")).distinct(),
                "__al",
                "left_anti",
            )
            .count()
        )
        assert phantom == 0


class TestIvfIncremental:
    """sim_ivf_incremental (round 13): ANN index maintenance without refit —
    batch vectors join the maintained IVF index via assignment only."""

    def test_oracle_exact_at_dev_scale(self, spark):
        import duckdb
        import pandas as pd

        from ad_hoc_olap_query_processing_engine_spark.oracle_lint import TABLES
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            registry,
            similarity,
        )

        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        got = similarity.sim_ivf_incremental(spark, SF).toPandas()
        sql = registry.oracle_sqls(["sim_ivf_incremental"])["sim_ivf_incremental"]
        exp = con.sql(sql).df()

        def norm(df):
            df = df[sorted(df.columns)].copy()
            return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
                drop=True
            )

        pd.testing.assert_frame_equal(norm(got), norm(exp), check_dtype=False)
        assert len(got) > 0

    def test_fit_never_sees_the_batch(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import similarity

        from ad_hoc_olap_query_processing_engine_spark.sources.catalog import (
            load_table,
        )

        e = load_table(spark, "embeddings", SF)
        fit_slice = (
            similarity._km_base(e)
            .filter(similarity._km_fit_filter() & ~similarity._ivfk_delta_pred())
            .select("vec_id")
        )
        leaked = fit_slice.filter(similarity._ivfk_delta_pred()).count()
        assert leaked == 0
        assert fit_slice.count() > 0

    def test_batch_pass_is_batch_sized_and_index_is_complete(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import similarity
        from ad_hoc_olap_query_processing_engine_spark.sources.catalog import (
            load_table,
        )

        e = load_table(spark, "embeddings", SF)
        n_all = e.count()
        n_delta = e.filter(similarity._ivfk_delta_pred()).count()
        assert 0 < n_delta < n_all
        cents = similarity._ivfk_model_cents(spark, SF)
        assert len(cents) == similarity.IVF_CLUSTERS
        delta_cells = (
            similarity._km_base(e)
            .filter(similarity._ivfk_delta_pred())
            .withColumn("cell", similarity._km_argmin(cents))
        )
        assert delta_cells.count() == n_delta
        base_cells = similarity._ivfk_base_cells(spark, SF)
        # refreshed index covers every vector exactly once
        assert base_cells.count() + n_delta == n_all


class TestStreamMaintenance:
    """stream_minhash_maintenance (round 13): the pair store folded across
    real micro-batches must equal a from-scratch rebuild."""

    def test_stream_fold_equals_full_recompute(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
            dedup_minhash_lsh,
        )
        from ad_hoc_olap_query_processing_engine_spark.streaming.maintenance import (
            stream_minhash_maintenance,
        )

        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in stream_minhash_maintenance(spark, SF).collect()
        }
        full = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup_minhash_lsh(spark, SF).collect()
        }
        assert got == full
        assert len(got) > 0

    def test_one_generation_of_state(self, spark):
        """Folding the stream must not accumulate one block set per
        micro-batch: after the drive, only the final pair table (plus any
        lazily-built family artifacts) may hold blocks."""
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )
        from ad_hoc_olap_query_processing_engine_spark.streaming import (
            maintenance,
        )

        # the generation-0 empty store is a session-cached family artifact
        # (round 14) — build it ahead of the snapshot so the bound below
        # measures the drive's residual, not the g0 artifact's four frames
        maintenance._stream_empty_store(spark, SF)
        before = _persisted_rdd_ids(spark)
        df = maintenance.stream_minhash_maintenance(spark, SF)
        df.count()
        after = _persisted_rdd_ids(spark)
        # the cached result is a union of two checkpointed legs (kept +
        # fresh); each fold's intermediate generations and pins must be
        # released — bound the residual instead of fingerprinting ids
        assert len(after - before) <= 3


class TestRefreshStorePlans:
    """The maintenance path's store scans must plan as broadcast probes
    (measured-size gates), never as a sort-merge exchange of the
    corpus-sized store — the shuffle-free per-batch claim."""

    def test_store_legs_are_broadcast_probes(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import pipeline

        frames = pipeline._incr_delta_frames(spark, SF)
        for leg in ("kept_cands", "kept_base"):
            plan = frames[leg]._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan, f"{leg}: no broadcast probe"
            assert "SortMergeJoin" not in plan, f"{leg}: store-sized merge join"
