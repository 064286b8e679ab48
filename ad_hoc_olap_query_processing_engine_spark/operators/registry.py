"""Registry mapping operator/query names → (Spark callable, oracle SQL).

Every operator claimed done in SURVEY.md §2 gets an entry here; the driver
contract (__spark_entry__.py) re-exports them. Entries with ``oracle=None``
are non-SQL-expressible (streaming, approximate sketches) and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Runner = Callable[[SparkSession, str], DataFrame]


# An oracle is either a static ANSI-SQL string, a LAZY oracle — a callable
# over the sf_dir that bakes data-derived literals (e.g. the PCA fit) into
# the SQL at oracle_sqls() time — or None for the driver's weaker rows-only
# check.  Lazy oracles resolve against $CROSSCHECK_SF_DIR (default: the
# driver's compare scale, /root/testdata/sf0.01), the same env the
# crosscheck and scale-sweep harnesses already steer by.
Oracle = str | Callable[[str], str] | None


@dataclass(frozen=True)
class Op:
    name: str
    run: Runner
    oracle: Oracle


_REGISTRY: dict[str, Op] = {}


def register(name: str, run: Runner, oracle: Oracle) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate operator registration: {name}")
    _REGISTRY[name] = Op(name=name, run=run, oracle=oracle)


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    from . import relational  # noqa: F401

    from . import advanced  # noqa: F401
    from . import cdc  # noqa: F401
    from . import dedup  # noqa: F401
    from . import graph  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import olap  # noqa: F401
    from . import olap_gapfill  # noqa: F401
    from . import olap_subqueries  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import prefilter  # noqa: F401
    from . import sampling  # noqa: F401
    from . import similarity  # noqa: F401
    from . import sketches  # noqa: F401
    from . import stats  # noqa: F401
    from . import text  # noqa: F401
    from . import timeseries  # noqa: F401
    from ..functions import scalar  # noqa: F401
    from ..sources import pydatasource  # noqa: F401
    from ..streaming import maintenance  # noqa: F401
    from ..streaming import windows  # noqa: F401


def all_ops() -> dict[str, Op]:
    _load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, Runner]:
    return {name: op.run for name, op in all_ops().items()}


# Lazy-oracle resolutions memoized per (name, sf_dir): a lazy oracle (the
# PCA fit) scans real data to bake its literals, so enumerating the oracle
# map twice must not pay twice — and a resolution FAILURE (e.g. a partial
# data dir without embeddings.parquet) must degrade only that op to the
# rows-only check, never abort the whole map (ADVICE r11).  Failures are
# memoized too: a broken data dir stays broken within a process.
_LAZY_RESOLVED: dict[tuple[str, str], str | None] = {}


def _resolve_oracle(name: str, oracle: Oracle, sf_dir: str) -> str | None:
    if not callable(oracle):
        return oracle
    key = (name, sf_dir)
    if key not in _LAZY_RESOLVED:
        try:
            _LAZY_RESOLVED[key] = oracle(sf_dir)
        except Exception as exc:
            import sys

            print(
                f"registry: lazy oracle for {name!r} failed against "
                f"{sf_dir}: {exc} — degrading to rows-only",
                file=sys.stderr,
            )
            _LAZY_RESOLVED[key] = None
    return _LAZY_RESOLVED[key]


def oracle_sqls(names: list[str] | None = None) -> dict[str, str]:
    """Oracle SQL per op; ``names`` restricts resolution to the requested
    ops so a targeted harness rerun never pays an unrelated lazy oracle's
    data scan (ADVICE r11 — scale_sweep reruns of non-PCA ops)."""
    import os

    sf_dir = os.environ.get("CROSSCHECK_SF_DIR", "/root/testdata/sf0.01")
    ops = all_ops()
    wanted = ops.items() if names is None else (
        (n, ops[n]) for n in names if n in ops
    )
    out = {}
    for name, op in wanted:
        sql = _resolve_oracle(name, op.oracle, sf_dir)
        if sql is not None:
            out[name] = sql
    return out
