"""Shared oracle result-type lint (single source of truth).

The driver hash-matches Spark results against DuckDB oracle results. DuckDB
types an uncast ``SUM(int)`` / ``list_sum(int)`` as HUGEINT (int128) and an
uncast DECIMAL stays DECIMAL — both serialize differently from Spark's
BIGINT/DOUBLE in the driver's value-hash, flipping hash_match false even
when every value is identical (round-5 postmortem: 6/50 driver rows red for
exactly this). Worse, ``.df()`` silently coerces HUGEINT to float64 and
DECIMAL to object, so a pandas value-compare alone is structurally blind to
the defect class — the lint checks the relation's DECLARED types at bind
time instead.

Imported by BOTH gates — tests/test_oracle_types.py (pytest) and
scripts/crosscheck.py (ad-hoc harness) — so the allow-set cannot drift
between them.
"""

from __future__ import annotations

# Closed allow-set: these DuckDB types hash identically to their Spark
# counterparts under the driver's canonicalization. Anything else (HUGEINT,
# DECIMAL, TIMESTAMP WITH TIME ZONE, nested types, ...) must be CAST in the
# oracle SQL to one of these.
ALLOWED_TYPES = frozenset(
    {
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "DOUBLE", "FLOAT",
        "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
    }
)

# The driver's pre-registered oracle views.
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def bad_columns(con, sql: str) -> list[tuple[str, str]]:
    """(column, type) pairs of ``sql``'s output whose declared DuckDB type is
    outside the hash-safe allow-set. Binding only — no execution."""
    rel = con.sql(sql)
    return [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED_TYPES
    ]
