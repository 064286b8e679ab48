"""Phi → ANSI SQL generator (the correctness oracle).

Renders a :class:`PhiQuery` as a single ANSI-SQL statement runnable by BOTH
DuckDB (the driver's oracle engine) and Spark SQL. Deliberately uses the
*naive textbook* formulation — every grouping variable is a groups ⋈ base
join-aggregate CTE — which is structurally different from the optimized
DataFrame plan in phi/planner.py (fused conditional aggregates, windows,
complements). Matching results between the two formulations is therefore a
meaningful cross-check, not a tautology.

Shape:

    WITH sales AS (<derivation view>),               -- optional
         base  AS (SELECT * FROM sales WHERE ...),   -- global σ
         acc0  AS (SELECT DISTINCT v1,... FROM base),            -- group table
         g0    AS (SELECT v..., fn(src) AS a FROM base GROUP BY v...),
         acc0g AS (acc0 LEFT JOIN g0),
         gv1   AS (SELECT g.v..., fn(s.src) AS a1
                   FROM <prev acc> g JOIN base s
                     ON <MF-predicates> AND <tuple σ> GROUP BY g.v...),
         acc1  AS (<prev acc> LEFT JOIN gv1),
         ...
    SELECT <select list> FROM accN WHERE <having>

Dependent aggregates (reference O10) work because gv_k joins against
acc_{k-1}, which already carries every earlier aggregate.

Type pinning (so Spark and DuckDB schemas agree): avg → CAST AS DOUBLE,
sum → CAST AS BIGINT, count → COUNT(*) with COALESCE(...,0) at join-back
(the B4 null policy: count 0, others NULL — same as the planner).
"""

from __future__ import annotations

from .ast import Agg, Cond, Having, Operand, PhiQuery

_SQL_OPS = {"==": "=", "!=": "<>", "<": "<", ">": ">", "<=": "<=", ">=": ">="}


def _lit_sql(value: object) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def _operand_sql(o: Operand, tuple_alias: str = "s", group_alias: str = "g") -> str:
    if o.kind == "col":
        return f"{tuple_alias}.{o.name}"
    if o.kind == "mf":
        return f"{group_alias}.{o.name}"
    return _lit_sql(o.value)


def _cond_sql(
    c: Cond, tuple_alias: str = "s", group_alias: str = "g", membership: bool = False
) -> str:
    left = _operand_sql(c.left, tuple_alias, group_alias)
    right = _operand_sql(c.right, tuple_alias, group_alias)
    if membership and c.op == "==":
        # MF membership equality is NULL-safe: GROUP BY puts NULL-keyed
        # tuples into a NULL group (both engines), so "tuple belongs to its
        # group" must hold for NULL keys too. Plain = would silently empty
        # every NULL-keyed group's aggregates.
        return f"{left} IS NOT DISTINCT FROM {right}"
    if membership and c.op == "!=":
        # ... and its negation is likewise null-safe ("other groups" includes
        # the NULL-keyed group when this group's key is non-NULL, and vice
        # versa) — required for the planner's complement arithmetic to be a
        # true partition of the tuples.
        return f"{left} IS DISTINCT FROM {right}"
    return f"{left} {_SQL_OPS[c.op]} {right}"


def _agg_sql(a: Agg, tuple_alias: str = "s") -> str:
    src = f"{tuple_alias}.{a.src}"
    if a.fn == "count":
        return "COUNT(*)"
    if a.fn == "avg":
        # NOT AVG(): DuckDB's integer AVG accumulates incrementally, so its
        # last ulp depends on the parallel accumulation order (observed
        # 1-ulp run-to-run flips under its morsel scheduler). The exact-sum
        # single division is order-independent and matches Spark's Average
        # (integral sum, one double division) bit-for-bit.
        return f"(CAST(SUM({src}) AS DOUBLE) / COUNT({src}))"
    if a.fn == "sum":
        return f"CAST(SUM({src}) AS BIGINT)"
    return f"{a.fn.upper()}({src})"


def phi_to_sql(
    q: PhiQuery,
    relation_sql: str | None = None,
    relation_name: str = "sales",
) -> str:
    """Render the query; ``relation_sql`` (e.g. the sales derivation view) is
    inlined as the first CTE so the statement is self-contained for DuckDB."""
    v = q.group_attrs
    v_list = ", ".join(v)
    ctes: list[str] = []
    if relation_sql is not None:
        ctes.append(f"{relation_name} AS (\n{relation_sql}\n)")

    if q.where:
        where_sql = " AND ".join(_cond_sql(c, tuple_alias=relation_name) for c in q.where)
        ctes.append(
            f"base AS (SELECT * FROM {relation_name} WHERE {where_sql})"
        )
    else:
        ctes.append(f"base AS (SELECT * FROM {relation_name})")

    acc = "acc0"
    ctes.append(f"acc0 AS (SELECT DISTINCT {v_list} FROM base)")

    if q.group0:
        g0_aggs = ", ".join(
            f"{_agg_sql(a, tuple_alias='base')} AS {a.name}" for a in q.group0
        )
        ctes.append(f"g0 AS (SELECT {v_list}, {g0_aggs} FROM base GROUP BY {v_list})")
        on = " AND ".join(f"g.{a} IS NOT DISTINCT FROM g0.{a}" for a in v)
        picks = ", ".join(
            f"COALESCE(g0.{a.name}, 0) AS {a.name}" if a.fn == "count" else f"g0.{a.name}"
            for a in q.group0
        )
        ctes.append(f"acc0g AS (SELECT g.*, {picks} FROM acc0 g LEFT JOIN g0 ON {on})")
        acc = "acc0g"

    for gv in q.gvs:
        k, name = gv.index, gv.agg.name
        conds = [_cond_sql(c, membership=True) for c in gv.mf_conds] + [
            _cond_sql(c) for c in gv.tuple_conds
        ]
        on = " AND ".join(conds)
        g_cols = ", ".join(f"g.{a} AS {a}" for a in v)
        group_by = ", ".join(f"g.{a}" for a in v)
        ctes.append(
            f"gv{k} AS (SELECT {g_cols}, {_agg_sql(gv.agg)} AS {name}\n"
            f"  FROM {acc} g JOIN base s ON {on}\n"
            f"  GROUP BY {group_by})"
        )
        join_on = " AND ".join(f"g.{a} IS NOT DISTINCT FROM gv{k}.{a}" for a in v)
        pick = (
            f"COALESCE(gv{k}.{name}, 0) AS {name}"
            if gv.agg.fn == "count"
            else f"gv{k}.{name} AS {name}"
        )
        ctes.append(
            f"acc{k} AS (SELECT g.*, {pick} FROM {acc} g LEFT JOIN gv{k} ON {join_on})"
        )
        acc = f"acc{k}"

    select_sql = ", ".join(q.select)
    tail = f"SELECT {select_sql} FROM {acc}"
    if q.having is not None:
        tail += f" WHERE {_having_sql(q.having)}"
    return "WITH " + ",\n".join(ctes) + "\n" + tail


def _having_sql(h: Having) -> str:
    if h.op == "leaf":
        c = h.cond

        def side(o: Operand) -> str:
            return o.name if o.kind == "mf" else _lit_sql(o.value)

        return f"{side(c.left)} {_SQL_OPS[c.op]} {side(c.right)}"
    joiner = " AND " if h.op == "and" else " OR "
    return "(" + joiner.join(_having_sql(ch) for ch in h.children) + ")"
