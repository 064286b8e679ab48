"""Logical IR for Phi (MF/EMF) queries.

The reference parses each query into positional text lines and re-parses the
predicate strings per tuple at runtime (reference:
src/QueryProcessor1.java:246-262). We instead parse once into typed dataclasses
and compile to a Spark DataFrame plan.

Condition semantics are normalized here: a :class:`Cond` always means
``eval(left) OP eval(right)``. The reference's MF-predicate form
``{MF.f.a}[op]{rhs}`` evaluates as ``rhs op mf.f`` (operand order flip at
reference: src/QueryProcessor1.java:253-263), so the parser stores it as
``Cond(left=rhs, op, right=MF field f)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Operator normalization. The reference distinguishes string ops (=, !=) from
# int ops (==, <>, <, >, <=, >=) (reference: src/QueryProcessor1.java:175-197);
# we normalize both spellings of equality/inequality and type literals instead.
NORMALIZED_OPS = {
    "=": "==",
    "==": "==",
    "!=": "!=",
    "<>": "!=",
    "<": "<",
    ">": ">",
    "<=": "<=",
    ">=": ">=",
}

AGG_FNS = ("sum", "avg", "min", "max", "count")


@dataclass(frozen=True)
class Operand:
    """One side of a condition.

    kind:
      - "col": a column of the input (tuple attribute), name in ``name``
      - "mf":  a field of the group table (grouping attr, group-0 aggregate,
               or an earlier grouping variable's aggregate), name in ``name``
      - "lit": a literal, typed python value in ``value``
    """

    kind: str
    name: str | None = None
    value: object = None

    def __repr__(self) -> str:  # compact for test failure messages
        if self.kind == "lit":
            return f"lit({self.value!r})"
        return f"{self.kind}({self.name})"


@dataclass(frozen=True)
class Cond:
    """A normalized condition: ``left OP right``."""

    left: Operand
    op: str  # one of NORMALIZED_OPS values
    right: Operand

    def __repr__(self) -> str:
        return f"({self.left!r} {self.op} {self.right!r})"


@dataclass(frozen=True)
class Agg:
    """An aggregate column: function + source column + output name.

    Name grammar (reference: src/QueryProcessor1.java:251-252): grouping
    variable form ``<fn>_<src>_<suffix>`` (fn = prefix to first ``_``, src =
    between first and last ``_``); group-0 form ``<fn>_<src>``
    (reference: src/QueryProcessor1.java:120-122).
    """

    fn: str  # sum | avg | min | max | count
    src: str  # source column
    name: str  # output column name (the full fvect / select token)


@dataclass
class GroupingVar:
    """One grouping variable (one F-vect slot + its such-that conditions)."""

    index: int  # 1-based GV number (reference scans run in this order)
    agg: Agg
    # Conditions whose lhs referenced the MF/group table ("MF." prefix,
    # reference classification at src/QueryProcessor1.java:210-215), normalized
    # to eval order. If the slot had none, the parser synthesizes same-group
    # equalities for every grouping attribute (implicit MF-join, reference:
    # src/QueryProcessor1.java:216-226) and sets ``synthesized``.
    mf_conds: list[Cond] = field(default_factory=list)
    # Pure sigma conditions on the tuple (e.g. {state}[=]{NY}).
    tuple_conds: list[Cond] = field(default_factory=list)
    synthesized: bool = False


@dataclass
class Having:
    """HAVING tree: leaves are Conds over output columns; nodes AND/OR them.

    Grammar (reference: src/AdhocQueryProcessor.java:448-459): one condition
    ``{a,op,b}`` or two joined by ``[&&]`` / ``[||]``. We support arbitrary
    chains. (The reference degrades any non-&& joiner to OR — B6 in SURVEY.md
    §2.4; we implement the intended semantics.)
    """

    op: str  # "leaf" | "and" | "or"
    cond: Cond | None = None
    children: list["Having"] = field(default_factory=list)


@dataclass
class PhiQuery:
    """A parsed Phi query (one ``~``-separated block of the mini-language)."""

    select: list[str]  # output columns, in order
    group_attrs: list[str]  # V, the grouping attributes
    group0: list[Agg]  # aggregates over all WHERE-passing tuples of the group
    gvs: list[GroupingVar]
    where: list[Cond] = field(default_factory=list)  # global sigma, AND-ed
    having: Having | None = None

    @property
    def n(self) -> int:
        return len(self.gvs)

    def output_fields(self) -> list[str]:
        """All computable field names: V + group-0 names + GV agg names."""
        return (
            list(self.group_attrs)
            + [a.name for a in self.group0]
            + [gv.agg.name for gv in self.gvs]
        )


class PhiParseError(ValueError):
    """Raised on malformed Phi-spec text (e.g. the reference's own query 1,
    whose select list is corrupt — B1 in SURVEY.md §2.4)."""
