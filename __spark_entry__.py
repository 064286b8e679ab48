"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine layout: see ``ad_hoc_olap_query_processing_engine_spark/`` (SURVEY.md is the blueprint).
The Phi (MF/EMF) golden queries come from the reference corpus
(/root/reference/src/Ad_hoc_Input.txt, SURVEY.md §2.2); their oracle SQL is
*generated* by phi/sqlgen.py in a deliberately different (naive join-agg)
formulation than the optimized DataFrame plans, so agreement is a real check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ad_hoc_olap_query_processing_engine_spark.phi import (
    all_phi_queries,
    compile_phi,
    phi_to_sql,
)
from ad_hoc_olap_query_processing_engine_spark.sources import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["phi_q1"](spark, "/root/testdata/sf0.001")


def _phi_runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        q = all_phi_queries()[name]
        return compile_phi(q, catalog.sales_df(spark, sf_dir))

    return run


# The driver checks only the first ~50 of queries() per round, so ordering IS
# the evidence strategy.  Since round 8 the order is DERIVED from the in-repo
# CORRECTNESS_r*.json history instead of a hand-curated list (round-7 verdict
# ask): (tier 0) queries whose LATEST driver row is red — re-confirm the fix
# immediately; (tier 1) queries with no driver row yet — new registrations get
# first evidence the round they land; (tier 2) green queries, oldest evidence
# first, so every query cycles through the 50-row window every ~4-5 rounds
# with no hand curation.  Ties break on registration order (stable).  Each
# round's new CORRECTNESS file automatically rotates the next round's head.


def _evidence_order(names: list[str], has_oracle: set[str]) -> list[str]:
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    latest_rows_only: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = bool(
                row
                and (row.get("hash_match") or row.get("err") == "no_oracle")
            )
            latest[name] = (rnd, green)
            latest_rows_only[name] = bool(row and row.get("err") == "no_oracle")

    reg_idx = {n: i for i, n in enumerate(names)}

    # REVALIDATE.json (round-10 verdict ask #3): {name: watermark_round} —
    # a query whose IMPLEMENTATION was rewritten gets re-prioritized until
    # it has driver evidence from a round AFTER the watermark; then the
    # entry is inert (self-expiring — no manual cleanup, safe to leave in
    # place).  Green small-scale evidence that PRE-dates a rewrite isn't
    # evidence about the shipped code; the rotation can't see code changes,
    # so the rewrite records one.
    revalidate: dict[str, int] = {}
    try:
        with open(os.path.join(here, "REVALIDATE.json")) as fh:
            revalidate = {k: int(v) for k, v in json.load(fh).items()}
    except (OSError, ValueError):
        pass

    # Φ staleness ceiling (round-10 verdict ask #6): the Φ goldens ARE the
    # reference-parity surface — they must never drift more than ~4 rounds
    # without driver evidence, even when the plain oldest-first rotation
    # would schedule them later.  current round ≈ max evidence round + 1.
    cur_round = max((r for r, _ in latest.values()), default=0) + 1

    # a query whose only green evidence is a rows-only row ("no_oracle") but
    # which NOW carries an oracle has never been hash-checked under its
    # current contract — treat it like a new registration (tier 1) so the
    # upgraded oracle gets driver evidence the round it lands.  The oracle
    # key set is passed IN (not re-derived via oracle_sql()) so the ordering
    # helpers never call back into the contract functions — the previous
    # oracle_sql() → _prioritize → _evidence_order → oracle_sql() cycle did
    # ~250× redundant work and terminated only on RecursionError.
    #
    # Tier order: 0 = latest row red; 1 = rewritten code awaiting
    # post-watermark evidence (REVALIDATE); 2 = never checked / oracle
    # upgraded; 3 = Φ parity golden ≥4 rounds stale; 4 = green, oldest
    # evidence first.

    def key(n: str) -> tuple[int, int, int]:
        rnd_green = latest.get(n)
        if rnd_green is None:
            return (2, 0, reg_idx[n])  # never checked
        rnd, green = rnd_green
        if not green:
            return (0, rnd, reg_idx[n])
        if rnd <= revalidate.get(n, -1):
            return (1, rnd, reg_idx[n])  # rewritten: evidence pre-dates code
        if green and latest_rows_only.get(n) and n in has_oracle:
            return (2, 0, reg_idx[n])  # oracle upgraded: needs a hash row
        if n.startswith("phi_q") and cur_round - rnd >= 4:
            return (3, rnd, reg_idx[n])  # parity surface staleness ceiling
        return (4, rnd, reg_idx[n])

    return sorted(names, key=key)


def _prioritize(full: dict, has_oracle: set[str]) -> dict:
    return {n: full[n] for n in _evidence_order(list(full), has_oracle)}


def _oracle_names() -> set[str]:
    """Key set of every query that carries a DuckDB oracle (Φ goldens all
    do; registry entries only when ``op.oracle`` is not None)."""
    from ad_hoc_olap_query_processing_engine_spark.operators import registry

    return set(all_phi_queries()) | {
        name for name, op in registry.all_ops().items() if op.oracle is not None
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in all_phi_queries():
        out[name] = _phi_runner(name)

    from ad_hoc_olap_query_processing_engine_spark.operators import registry

    out.update(registry.spark_queries())
    return _prioritize(out, _oracle_names())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each queries() key (tables pre-registered
    as views; the `sales` relation is inlined as a CTE)."""
    out = {
        name: phi_to_sql(q, relation_sql=catalog.SALES_VIEW_SQL)
        for name, q in all_phi_queries().items()
    }

    from ad_hoc_olap_query_processing_engine_spark.operators import registry

    out.update(registry.oracle_sqls())
    # the dict being ordered IS the oracle set here
    return _prioritize(out, set(out))
