from .ast import Agg, Cond, GroupingVar, Having, Operand, PhiParseError, PhiQuery
from .goldens import GOLDEN_SPECS, golden_queries
from .parser import parse_queries, parse_query
from .planner import PhiPlanError, compile_phi
from .sqlgen import phi_to_sql

__all__ = [
    "Agg",
    "Cond",
    "GroupingVar",
    "Having",
    "Operand",
    "PhiParseError",
    "PhiPlanError",
    "PhiQuery",
    "GOLDEN_SPECS",
    "golden_queries",
    "parse_queries",
    "parse_query",
    "compile_phi",
    "phi_to_sql",
]
