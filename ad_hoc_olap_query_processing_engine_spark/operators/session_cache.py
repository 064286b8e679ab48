"""Session-scoped materialized-index cache.

Several operator families share a maintained artifact (shingle postings,
verified near-dup pairs, SRP projections, the hourly rollup tier): at
warehouse scale these are tables a pipeline materializes once and many jobs
read. Locally the analogue is a persisted DataFrame built once per
(SparkSession, sf_dir). One helper instead of a hand-rolled dict per module.

Lifecycle rules (the leaks a long-lived embedding host would otherwise hit):

- entries of DEAD sessions are dropped (their persisted blocks died with the
  SparkContext; keeping references would leak DataFrame objects forever in a
  process that recreates sessions);
- entries evicted while their session is STILL ALIVE are unpersisted first,
  releasing executor memory (a session iterating many sf_dirs otherwise
  accumulates persisted blocks without bound — per-name LRU cap below);
- builds are serialized under a module lock so concurrent first calls cannot
  double-build and leak the loser's persisted blocks.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHES: dict[str, dict[tuple[str, str], DataFrame]] = {}
_LOCK = threading.RLock()

# live sf_dirs kept per artifact name within one session; oldest evicted
# (and unpersisted) beyond this
MAX_SF_DIRS_PER_NAME = 4


def _drop(df: DataFrame) -> None:
    """Unpersist, tolerating an already-dead SparkContext."""
    try:
        df.unpersist()
    except Exception:
        pass


def session_cached(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Get-or-build the named artifact for (this session, this sf_dir).

    ``build`` should return an already-persisted (or checkpointed)
    DataFrame; it runs at most once per live session per sf_dir."""
    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    with _LOCK:
        cache = _CACHES.setdefault(name, {})
        if key not in cache:
            # dead-session entries: blocks are already gone, just drop refs
            for stale in [k for k in cache if k[0] != app]:
                cache.pop(stale)
            cache[key] = build()
            # live-session LRU cap: unpersist the oldest surplus entries
            while len(cache) > MAX_SF_DIRS_PER_NAME:
                oldest = next(iter(cache))
                _drop(cache.pop(oldest))
        return cache[key]


def invalidate(name: str | None = None) -> None:
    """Unpersist and forget cached artifacts — all of them, or one name."""
    with _LOCK:
        names = [name] if name is not None else list(_CACHES)
        for n in names:
            for df in _CACHES.pop(n, {}).values():
                _drop(df)
