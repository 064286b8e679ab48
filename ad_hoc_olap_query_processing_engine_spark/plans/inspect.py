"""Physical-plan inspection helpers.

The 100 TB contract of this engine is enforced here, as assertions over
``explain()`` output (tests/test_plans.py): filters must reach the parquet
scans, fact tables must not be scanned more often than the operator's
algorithm requires, dimension joins must broadcast, and pure-θ EMF joins must
broadcast the (small) group side instead of shuffling the fact side.

These parse the executed-plan string — the same thing a human reads from
``df.explain("formatted")`` — so the tests document the *intended* plan shape
right next to the operator code.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Physical plan in ``formatted`` explain mode (full scan locations —
    the plain ``toString`` truncates them)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def table_scan_count(df: DataFrame, table_file: str) -> int:
    """How many times a parquet file/dir is scanned in the plan
    (e.g. ``lineitem.parquet``). ReusedExchange subtrees don't re-scan."""
    plan = physical_plan(df)
    return len(re.findall(re.escape(table_file), plan))


def count_exchanges(df: DataFrame) -> int:
    plan = physical_plan(df)
    return plan.count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-trivial pushed/data filters on scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"(?:PushedFilters|DataFilters): \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def exchange_args(df: DataFrame) -> list[str]:
    """The Arguments line of every Exchange node in the formatted plan —
    e.g. ['hashpartitioning(user_id, ...)', 'SinglePartition, ...'] — so
    tests can count/classify shuffles precisely (the node name and its
    partitioning are on separate lines in ``formatted`` mode)."""
    plan = physical_plan(df)
    ids = re.findall(r"\((\d+)\) \w*Exchange\b", plan)
    out: list[str] = []
    for i in ids:
        m = re.search(rf"\({i}\) \w*Exchange\b[^\n]*\n(?:[^\n]*\n)?Arguments: ([^\n]*)", plan)
        if m:
            out.append(m.group(1))
    return out


def observed_counts(df: DataFrame, *metric_cols) -> tuple[DataFrame, "Observation"]:
    """Attach a named Observation to ``df`` — Spark's zero-cost pipeline
    telemetry: the metrics are computed BY THE ACTION ITSELF (accumulator
    semantics inside the same job), so row counts / null counts / sums of a
    100 TB write cost no second scan, unlike a separate ``df.count()``.
    Returns ``(instrumented_df, observation)``; read ``observation.get``
    after any action on the instrumented frame.

    Default metrics when none given: row count. Callers pass aliased
    aggregate Columns for anything richer (null counts, min/max freshness
    timestamps — the data-quality gates an ingest pipeline records per
    batch)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    metrics = list(metric_cols) or [F.count(F.lit(1)).alias("n_rows")]
    return df.observe(obs, *metrics), obs
