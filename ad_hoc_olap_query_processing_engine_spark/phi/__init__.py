from .ast import Agg, Cond, GroupingVar, Having, Operand, PhiParseError, PhiQuery
from .goldens import EXTENSION_SPECS, GOLDEN_SPECS, all_phi_queries, golden_queries
from .parser import parse_queries, parse_query
from .planner import PhiPlanError, compile_phi
from .sqlgen import phi_to_sql


def phi(df, spec: str):
    """One-call public API: run a Φ-spec against ANY DataFrame (not just the
    `sales` fixture) — operand names resolve against the frame's columns.

    >>> phi(events_df, "user_id,avg_value_hi\\n1\\nuser_id\\navg_value_hi\\n"
    ...                "{value}[>]{50}")
    """
    q = parse_query(spec.splitlines(), known_cols=set(df.columns))
    return compile_phi(q, df)

__all__ = [
    "phi",
    "Agg",
    "Cond",
    "GroupingVar",
    "Having",
    "Operand",
    "PhiParseError",
    "PhiPlanError",
    "PhiQuery",
    "EXTENSION_SPECS",
    "GOLDEN_SPECS",
    "all_phi_queries",
    "golden_queries",
    "parse_queries",
    "parse_query",
    "compile_phi",
    "phi_to_sql",
]
