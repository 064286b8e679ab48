"""Round-13 optimization pins.

1. ``session_cached`` builds of DIFFERENT artifacts may run concurrently
   (the parallel bench warmup depends on it), while racing calls for the
   SAME artifact still build exactly once.
2. The similarity scoring rebalance (`_spread`) actually lands in the
   physical plan: the brute-force candidate side carries a round-robin
   exchange below the broadcast join, so the scoring stage is no longer
   fused into the single-partition scan.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestSessionCacheConcurrency:
    def test_distinct_artifacts_build_concurrently(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        names = ["__opt13_conc_a", "__opt13_conc_b"]
        for n in names:
            session_cache.invalidate(n)
        in_build = []
        overlap = []
        gate = threading.Barrier(2, timeout=30)

        def builder(tag):
            def build():
                in_build.append(tag)
                try:
                    # both builders must be inside build() at once — the old
                    # module-wide build lock deadlocks this barrier
                    gate.wait()
                    overlap.append(tag)
                except threading.BrokenBarrierError:
                    pass
                return spark.range(10).withColumn("t", F.lit(tag)).persist()

            return build

        threads = [
            threading.Thread(
                target=lambda n=n, t=t: session_cache.session_cached(
                    n, spark, SF, builder(t)
                )
            )
            for n, t in zip(names, ["a", "b"])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert sorted(overlap) == ["a", "b"], (
            f"distinct-artifact builds serialized (overlap={overlap})"
        )
        for n in names:
            session_cache.invalidate(n)

    def test_same_artifact_builds_once_under_race(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )

        name = "__opt13_race"
        session_cache.invalidate(name)
        builds = []
        results = []

        def build():
            builds.append(1)
            time.sleep(0.2)  # widen the race window
            return spark.range(5).persist()

        def call():
            results.append(session_cache.session_cached(name, spark, SF, build))

        threads = [threading.Thread(target=call) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert len(builds) == 1, f"artifact built {len(builds)} times"
        assert all(r is results[0] for r in results)
        session_cache.invalidate(name)


class TestGatedSpreadEquivalence:
    def test_kmeans_results_identical_with_spread_engaged(self, spark):
        """The size gate means the k-means spreads never engage at the
        driver's correctness scales — force the gate to 0 and pin that the
        engaged branch (repartition before fit/assignment) produces the
        IDENTICAL result set, so the sf≥1 path is covered by the same
        oracle-checked arithmetic."""
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            similarity as S,
        )

        gated = sorted(
            tuple(r) for r in S.sim_ivf_kmeans(spark, SF).collect()
        )
        old = S.SPREAD_MIN_ROWS
        S.SPREAD_MIN_ROWS = 0
        try:
            engaged = sorted(
                tuple(r) for r in S.sim_ivf_kmeans(spark, SF).collect()
            )
        finally:
            S.SPREAD_MIN_ROWS = old
        assert engaged == gated

    def test_ivf_incremental_identical_with_spread_engaged(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            session_cache,
        )
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            similarity as S,
        )

        gated = sorted(
            tuple(r) for r in S.sim_ivf_incremental(spark, SF).collect()
        )
        old = S.SPREAD_MIN_ROWS
        S.SPREAD_MIN_ROWS = 0
        # drop the maintained artifacts so the engaged branch rebuilds them
        session_cache.invalidate("ivfk_base_model")
        session_cache.invalidate("ivfk_base_cells")
        try:
            engaged = sorted(
                tuple(r) for r in S.sim_ivf_incremental(spark, SF).collect()
            )
        finally:
            S.SPREAD_MIN_ROWS = old
            session_cache.invalidate("ivfk_base_model")
            session_cache.invalidate("ivfk_base_cells")
        assert engaged == gated


class TestScoringSpreadPlan:
    def test_brute_candidate_side_is_rebalanced(self, spark):
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            similarity,
        )

        df = similarity.sim_brute_topk(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan, (
            "scoring side lost its rebalance exchange:\n" + plan[:2000]
        )


class TestTrigramGatedCheckpointEquivalence:
    def test_trigram_results_identical_with_c3_pinned(self, spark):
        """text_trigram_lm pins its c3 count table (lazy localCheckpoint)
        only above the big-corpus gate, so the driver's correctness scales
        exercise the unpinned branch — force the gate down and pin that the
        pinned branch returns the identical result set."""
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            dedup,
        )
        from ad_hoc_olap_query_processing_engine_spark.operators import (
            text as T,
        )

        ungated = sorted(tuple(r) for r in T.text_trigram_lm(spark, SF).collect())
        old = dedup.PAIR_HINT_MIN_DOCS
        dedup.PAIR_HINT_MIN_DOCS = 0
        try:
            pinned = sorted(
                tuple(r) for r in T.text_trigram_lm(spark, SF).collect()
            )
        finally:
            dedup.PAIR_HINT_MIN_DOCS = old
        assert pinned == ungated
