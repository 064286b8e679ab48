"""Driver-contract pins for __spark_entry__.py.

The driver checks only the first ~50 queries() entries per round, so the
ordering IS the evidence strategy.  Since round 8 the order is derived from
the in-repo CORRECTNESS_r*.json history (oldest-evidence-first rotation,
round-7 verdict ask); these tests pin the policy without a SparkSession.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry


def test_evidence_order_policy(tmp_path, monkeypatch):
    """red-latest first, never-checked second, green by oldest round last;
    registration order breaks ties."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "old_green": {"hash_match": True, "err": None},
                "was_red_then_green": {"hash_match": False, "err": "boom"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "was_red_then_green": {"hash_match": True, "err": None},
                "fresh_green": {"hash_match": True, "err": None},
                "latest_red": {"hash_match": False, "err": "boom"},
                "rows_only": {"hash_match": None, "err": "no_oracle"},
            }
        )
    )
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "__spark_entry__.py"))
    names = [
        "old_green",
        "fresh_green",
        "latest_red",
        "never_checked_b",
        "never_checked_a",
        "rows_only",
        "was_red_then_green",
    ]
    # no query in this synthetic fixture carries an oracle — rows_only must
    # NOT be promoted to tier 1 (that promotion is exercised below with a
    # non-empty oracle set)
    got = entry._evidence_order(names, has_oracle=set())
    assert got == [
        # tier 0: latest row red
        "latest_red",
        # tier 1: no driver row yet, registration order
        "never_checked_b",
        "never_checked_a",
        # tier 2: green, oldest evidence first, then registration order
        "old_green",
        "fresh_green",
        "rows_only",
        "was_red_then_green",
    ]

    # oracle-upgrade rule: a green rows-only row whose query NOW carries an
    # oracle has never been hash-checked under its current contract — it is
    # promoted to tier 1 (never-checked)
    got_up = entry._evidence_order(names, has_oracle={"rows_only"})
    assert got_up.index("rows_only") < got_up.index("old_green")
    assert got_up[0] == "latest_red"  # red still outranks the promotion


def test_evidence_order_no_contract_recursion(monkeypatch):
    """_evidence_order must never call back into queries()/oracle_sql() —
    the r9 cycle did ~250× redundant work and was stack-depth dependent
    (ADVICE r9, medium)."""
    import sys

    def boom(*a, **k):  # pragma: no cover - should never fire
        raise AssertionError("ordering helper called a contract function")

    monkeypatch.setattr(entry, "queries", boom)
    monkeypatch.setattr(entry, "oracle_sql", boom)
    limit = sys.getrecursionlimit()
    sys.setrecursionlimit(60)
    try:
        out = entry._evidence_order(["a", "b"], has_oracle={"a"})
    finally:
        sys.setrecursionlimit(limit)
    assert sorted(out) == ["a", "b"]


def test_real_history_orders_stalest_first():
    """Against the actual in-repo CORRECTNESS history: every query in the
    head-50 must have evidence no NEWER than any query outside it (within
    tier), i.e. the window really is oldest-first."""
    q = entry.queries()
    names = list(q)
    assert len(names) >= 200

    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(entry.__file__))
    latest: dict[str, int] = {}
    rows_only_latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            latest[name] = rnd
            rows_only_latest[name] = bool(row and row.get("err") == "no_oracle")
    # never-checked sorts before all green evidence; a query whose latest
    # row was rows-only but which now carries an oracle counts as never
    # hash-checked under its current contract (the oracle-upgrade rule)
    has_oracle = set(entry.oracle_sql())

    def eff_round(n: str) -> int:
        if n not in latest:
            return -1
        if rows_only_latest.get(n) and n in has_oracle:
            return -1
        return latest[n]

    # Documented exceptions to strict oldest-first (round 11): queries whose
    # implementation was rewritten re-prioritize via REVALIDATE.json until
    # they carry post-watermark evidence, and Φ parity goldens ≥4 rounds
    # stale jump the queue (both tiers sort ahead of plain green rotation).
    revalidate = {}
    reval_path = os.path.join(here, "REVALIDATE.json")
    if os.path.exists(reval_path):
        revalidate = {k: int(v) for k, v in json.load(open(reval_path)).items()}
    cur_round = max(latest.values(), default=0) + 1

    def exempt(n: str) -> bool:
        if n in latest and latest[n] <= revalidate.get(n, -1):
            return True
        return n.startswith("phi_q") and n in latest and cur_round - latest[n] >= 4

    head_rounds = [eff_round(n) for n in names[:50] if not exempt(n)]
    tail_rounds = [eff_round(n) for n in names[50:] if not exempt(n)]
    assert max(head_rounds) <= min(tail_rounds)


def test_revalidate_names_are_registered():
    """Every REVALIDATE.json key must be a registered query (a typo would
    silently prioritize nothing)."""
    import os

    here = os.path.dirname(os.path.abspath(entry.__file__))
    path = os.path.join(here, "REVALIDATE.json")
    if not os.path.exists(path):
        return
    assert set(json.load(open(path))) <= set(entry.queries())


def test_oracle_and_queries_keys_align():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    # every oracle refers to a registered query; rows-only ops may lack one
    assert o <= q
    # round 11: embed_pca_project graduated to hash-checked — nothing is
    # rows-only anymore; keep the check so a future rows-only op is a
    # deliberate decision here, not an accident
    rows_only = q - o
    assert rows_only == set()
