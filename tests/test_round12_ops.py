"""Round-12 pins.

Headline: per-round frontier-sized planning in connected_components
(round-11 verdict ask #2) — after each round the materialized frontier is
counted, and small frontiers/offer tables are broadcast into the next
round's joins so the corpus-scale edge list is probed instead of re-sorted.
These tests pin (a) broadcast/shuffle plan EQUIVALENCE on a multi-round
graph, and (b) the fail-soft lazy-oracle contract from ADVICE r11 (one
broken lazy oracle degrades only its own op, memoized per sf_dir).
"""

from __future__ import annotations

import pytest

from ad_hoc_olap_query_processing_engine_spark.operators import dedup, registry


def _cc_sets(spark, pairs, **kw):
    return {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(
            spark.createDataFrame(pairs, "doc_a long, doc_b long"), **kw
        ).collect()
    }


def test_cc_broadcast_and_shuffle_plans_agree(spark, monkeypatch):
    """The broadcast escalation is a PHYSICAL choice only: labels must be
    identical with broadcasting forced OFF (every frontier 'too big') and
    forced ON (threshold far above the graph).  The graph needs multiple
    propagation rounds (two chains + a clique), so rounds 2+ actually
    exercise the broadcast branch in the ON run."""
    pairs = [(i, i + 1) for i in range(1, 40)] + [
        (100, 101), (101, 102), (100, 102), (200, 250),
    ]
    monkeypatch.setattr(dedup, "CC_BROADCAST_MAX_ROWS", 0)
    never = _cc_sets(spark, pairs)
    monkeypatch.setattr(dedup, "CC_BROADCAST_MAX_ROWS", 10**9)
    always = _cc_sets(spark, pairs)
    assert never == always
    assert {c for _, c in always} == {1, 100, 200}


def test_cc_empty_offer_early_exit(spark):
    """A single already-converged edge: round 1 initializes labels, round 2's
    offer table improves nothing — the loop must break (via the n_prop/changed
    checks), not spin to CC_MAX_ROUNDS.  Pin by time-bounding indirectly:
    labels of a 2-clique are exact."""
    got = _cc_sets(spark, [(7, 9)])
    assert got == {(7, 7), (9, 7)}


def test_lazy_oracle_failure_degrades_only_its_op(monkeypatch):
    """ADVICE r11: a lazy oracle that raises (e.g. partial data dir) must
    drop ONLY its own op from the map — and the failure is memoized, so the
    second enumeration doesn't re-pay (or re-raise) the resolution."""
    calls = {"n": 0}

    def boom(sf_dir: str) -> str:
        calls["n"] += 1
        raise FileNotFoundError("embeddings.parquet absent")

    name = "__test_r12_broken_lazy__"
    registry._REGISTRY[name] = registry.Op(
        name=name, run=lambda spark, sf: None, oracle=boom
    )
    try:
        m1 = registry.oracle_sqls()
        assert name not in m1
        assert len(m1) > 0  # the rest of the map survived
        m2 = registry.oracle_sqls()
        assert name not in m2
        assert calls["n"] == 1  # memoized failure: resolved exactly once
    finally:
        registry._REGISTRY.pop(name, None)
        registry._LAZY_RESOLVED.pop(
            (name, __import__("os").environ.get(
                "CROSSCHECK_SF_DIR", "/root/testdata/sf0.01")), None)


def test_oracle_sqls_names_filter_skips_unrelated_lazy(monkeypatch):
    """Targeted resolution: oracle_sqls(names) must not resolve lazy oracles
    outside the requested set (the scale-sweep rerun path)."""
    calls = {"n": 0}

    def lazy(sf_dir: str) -> str:
        calls["n"] += 1
        return "SELECT 1 AS x"

    name = "__test_r12_lazy_skip__"
    registry._REGISTRY[name] = registry.Op(
        name=name, run=lambda spark, sf: None, oracle=lazy
    )
    try:
        out = registry.oracle_sqls(["dedup_exact"])
        assert name not in out and calls["n"] == 0
        out = registry.oracle_sqls([name])
        assert out[name] == "SELECT 1 AS x" and calls["n"] == 1
    finally:
        registry._REGISTRY.pop(name, None)
        registry._LAZY_RESOLVED.pop(
            (name, __import__("os").environ.get(
                "CROSSCHECK_SF_DIR", "/root/testdata/sf0.01")), None)


def test_minhash_pairs_releases_fingerprint_persist(spark):
    """The big-path fingerprint table must be released after the pair table
    materializes (ADVICE r11 leak): _checkpointed_pairs collects the pins
    and unpersists them — afterwards no corpus-scale RDD from the sketch
    remains in the persistence registry beyond the checkpoint itself."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta eta theta") for i in range(40)],
        "doc_id long, text string",
    )
    sh = dedup._shingles(docs).persist()
    sh.count()  # realize sh's own cached RDD before the snapshot
    before = {
        rid for rid, _ in spark.sparkContext._jsc.getPersistentRDDs().items()
    }
    out = dedup._checkpointed_pairs(sh, big=True)
    out.count()
    after_ids = dict(spark.sparkContext._jsc.getPersistentRDDs().items())
    # the sketch's internal persists (bands, sets) and the keyed checkpoint
    # are all released by the time the pair table is materialized; the ONLY
    # allowed survivor is the outer pair-table checkpoint itself.
    new = [rid for rid in after_ids if rid not in before]
    assert len(new) <= 1, f"leaked persisted RDDs: {new}"
    sh.unpersist()
