"""Parser for the Phi-spec mini-language.

Grammar (reference: src/AdhocQueryProcessor.java:41-151 and SURVEY.md §3.1) —
per query, positional lines separated by a line containing ``~``:

  1. select list            comma-separated output columns
  2. n                      number of grouping variables
  3. grouping attributes V  comma-separated
  4. F-vect                 aggregate names, one per GV: ``<fn>_<src>_<suffix>``
  5. such-that              comma-separated slots, one per GV; each slot is
                            ``:``-separated conditions ``{lhs}[op]{rhs}``;
                            slots beyond n are the global WHERE
                            (reference: src/AdhocQueryProcessor.java:662-669)
  6. HAVING (optional)      ``{a,op,b}`` or ``{a,op,b} [&&] {c,op,d}``

Group-0 aggregates are the select-list entries that are neither grouping
attributes nor F-vect names (detected in the reference by arity arithmetic at
src/AdhocQueryProcessor.java:101; we detect by name-set membership, which also
rejects the reference's malformed query 1 — B1 in SURVEY.md §2.4 — with a
clear error instead of a crash).
"""

from __future__ import annotations

import re

from .ast import (
    AGG_FNS,
    NORMALIZED_OPS,
    Agg,
    Cond,
    GroupingVar,
    Having,
    Operand,
    PhiParseError,
    PhiQuery,
)

# {lhs}[op]{rhs}
_COND_RE = re.compile(r"\{([^{}]*)\}\s*\[([^\[\]]*)\]\s*\{([^{}]*)\}")
# {a,op,b} for HAVING leaves
_HAVING_LEAF_RE = re.compile(r"\{([^{}]*),([^{},]*),([^{}]*)\}")
_QUERY_SEP = "~"


def parse_literal(text: str) -> object:
    """Type a literal the way intended semantics require: int if it parses,
    then float, else string. (The reference types by *operator* instead —
    ``=`` means string, others mean int parse — B8 in SURVEY.md §2.4.)"""
    t = text.strip()
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    return t


def parse_agg_name(name: str, *, allow_suffixless: bool) -> Agg | None:
    """Parse ``<fn>_<src>[_<suffix>]`` into an Agg, or None if not parseable.

    Reference name-splitting: fn = prefix to first ``_``, src = between first
    and last ``_`` (src/QueryProcessor1.java:251-252); group-0 form has no
    suffix (src/QueryProcessor1.java:120-122).
    """
    name = name.strip()
    if "_" not in name:
        return None
    fn, rest = name.split("_", 1)
    if fn not in AGG_FNS:
        return None
    if "_" in rest:
        src = rest.rsplit("_", 1)[0]
    else:
        if not allow_suffixless:
            return None
        src = rest
    if not src:
        return None
    return Agg(fn=fn, src=src, name=name)


def _parse_operand(text: str, known_cols: set[str] | None) -> Operand:
    """Resolve a raw operand string to col / mf / lit.

    ``MF.``-prefixed → mf field. A bare name that is a known input column →
    col; otherwise literal. When ``known_cols`` is None (schema-less parse),
    any identifier-looking token is treated as a column.
    """
    t = text.strip()
    if t.startswith("MF."):
        parts = t.split(".")
        if len(parts) < 2 or not parts[1]:
            raise PhiParseError(f"malformed MF operand: {text!r}")
        # MF.<field>.<aggcol>: the trailing aggcol names which GV the
        # condition updates — redundant with slot position, dropped here.
        return Operand(kind="mf", name=parts[1])
    if known_cols is not None:
        if t in known_cols:
            return Operand(kind="col", name=t)
        return Operand(kind="lit", value=parse_literal(t))
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
        return Operand(kind="col", name=t)
    return Operand(kind="lit", value=parse_literal(t))


def _normalize_op(op: str) -> str:
    o = op.strip()
    if o not in NORMALIZED_OPS:
        raise PhiParseError(f"unknown comparison operator: {op!r}")
    return NORMALIZED_OPS[o]


def parse_condition(text: str, known_cols: set[str] | None) -> Cond:
    """Parse one ``{lhs}[op]{rhs}`` condition into eval-order ``Cond``.

    MF-predicates ``{MF.f.a}[op]{rhs}`` evaluate as ``rhs op mf.f``
    (reference operand flip, src/QueryProcessor1.java:253-263), so they
    normalize to ``Cond(left=rhs, op, right=mf(f))``. Tuple predicates
    ``{col}[op]{rhs}`` evaluate left-to-right.
    """
    m = _COND_RE.fullmatch(text.strip())
    if not m:
        raise PhiParseError(f"malformed condition: {text!r}")
    lhs_raw, op_raw, rhs_raw = m.group(1), m.group(2), m.group(3)
    op = _normalize_op(op_raw)
    if lhs_raw.strip().startswith("MF."):
        mf = _parse_operand(lhs_raw, known_cols)
        rhs = _parse_operand(rhs_raw, known_cols)
        return Cond(left=rhs, op=op, right=mf)
    lhs = _parse_operand(lhs_raw, known_cols)
    # In a tuple predicate the rhs is a literal or another column; it is
    # never an MF field in the reference grammar.
    rhs = _parse_operand(rhs_raw, known_cols)
    if rhs.kind == "mf":
        return Cond(left=rhs, op=_flip(op), right=lhs)
    return Cond(left=lhs, op=op, right=rhs)


def _flip(op: str) -> str:
    return {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "==": "==", "!=": "!="}[op]


def _split_slots(line: str) -> list[str]:
    """Split the such-that line on commas that sit between conditions (i.e.
    not inside ``{...}`` / ``[...]``). Empty slots are PRESERVED — slots are
    positional (slot i belongs to GV i+1); an empty slot means "no explicit
    conditions" and gets the implicit same-group synthesis."""
    slots, depth, buf = [], 0, []
    for ch in line:
        if ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
        if ch == "," and depth == 0:
            slots.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    slots.append("".join(buf))
    return [s.strip() for s in slots]


def _tokenize_having(line: str) -> list[tuple[str, "re.Match[str] | None"]]:
    """HAVING tokens: leaves ``{field,op,value}``, joiners (``&&``/``||``,
    bracketed or bare), and ``(``/``)`` grouping (an engine extension — the
    reference's hand-patched HAVING, QueryProcessor6.java:340,346, is a flat
    chain; parentheses let a query override the left-fold association)."""
    tokens: list[tuple[str, re.Match[str] | None]] = []
    i = 0
    while i < len(line):
        ch = line[i]
        if ch.isspace():
            i += 1
        elif ch == "(":
            tokens.append(("lparen", None))
            i += 1
        elif ch == ")":
            tokens.append(("rparen", None))
            i += 1
        elif ch == "{":
            m = _HAVING_LEAF_RE.match(line, i)
            if m is None:
                raise PhiParseError(f"malformed HAVING leaf at: {line[i:]!r}")
            tokens.append(("leaf", m))
            i = m.end()
        else:
            j = i
            while j < len(line) and line[j] not in "{()":
                j += 1
            seg = line[i:j]
            if "&&" in seg:
                tokens.append(("and", None))
            elif "||" in seg:
                tokens.append(("or", None))
            else:
                raise PhiParseError(f"malformed HAVING joiner: {seg.strip()!r}")
            i = j
    return tokens


def parse_having(line: str, output_fields: set[str]) -> Having:
    """Parse the HAVING line. Operands name output columns (with or without a
    ``MF.`` prefix, cf. QueryProcessor6.java:340,346) or are typed literals.
    Joiners left-fold (reference association); parenthesized groups nest."""

    def leaf_operand(text: str) -> Operand:
        t = text.strip()
        if t.startswith("MF."):
            t = t.split(".", 1)[1]
            # may still carry a trailing .aggcol — field is the first part
            t = t.split(".", 1)[0]
        if t in output_fields:
            return Operand(kind="mf", name=t)
        return Operand(kind="lit", value=parse_literal(t))

    tokens = _tokenize_having(line)
    if not tokens:
        raise PhiParseError(f"malformed HAVING clause: {line!r}")
    pos = 0

    def term() -> Having:
        nonlocal pos
        if pos >= len(tokens):
            raise PhiParseError(f"truncated HAVING clause: {line!r}")
        kind, m = tokens[pos]
        if kind == "lparen":
            pos += 1
            node = expr()
            if pos >= len(tokens) or tokens[pos][0] != "rparen":
                raise PhiParseError(f"unbalanced '(' in HAVING: {line!r}")
            pos += 1
            return node
        if kind == "leaf":
            assert m is not None
            pos += 1
            cond = Cond(
                left=leaf_operand(m.group(1)),
                op=_normalize_op(m.group(2)),
                right=leaf_operand(m.group(3)),
            )
            return Having(op="leaf", cond=cond)
        raise PhiParseError(f"malformed HAVING clause: {line!r}")

    def expr() -> Having:
        nonlocal pos
        tree = term()
        while pos < len(tokens) and tokens[pos][0] in ("and", "or"):
            joiner = tokens[pos][0]
            pos += 1
            tree = Having(op=joiner, children=[tree, term()])
        return tree

    tree = expr()
    if pos != len(tokens):
        raise PhiParseError(f"unbalanced ')' in HAVING: {line!r}")
    return tree


def parse_query(lines: list[str], known_cols: set[str] | None = None) -> PhiQuery:
    """Parse one query block (5 or 6 non-empty lines) into a PhiQuery."""
    lines = [ln.strip() for ln in lines if ln.strip()]
    if len(lines) not in (5, 6):
        raise PhiParseError(f"expected 5 or 6 lines per query, got {len(lines)}")

    select = [c.strip() for c in lines[0].split(",") if c.strip()]
    try:
        n = int(lines[1])
    except ValueError as exc:
        raise PhiParseError(f"line 2 must be the GV count, got {lines[1]!r}") from exc
    group_attrs = [c.strip() for c in lines[2].split(",") if c.strip()]
    fvect = [c.strip() for c in lines[3].split(",") if c.strip()]
    if len(fvect) != n:
        raise PhiParseError(f"F-vect has {len(fvect)} entries but n={n}")

    gv_aggs: list[Agg] = []
    for name in fvect:
        agg = parse_agg_name(name, allow_suffixless=True)
        if agg is None:
            raise PhiParseError(f"unparseable aggregate name: {name!r}")
        gv_aggs.append(agg)

    # group-0 aggregates: select entries that are neither V nor F-vect.
    fvect_set, v_set = set(fvect), set(group_attrs)
    group0: list[Agg] = []
    for item in select:
        if item in v_set or item in fvect_set:
            continue
        agg = parse_agg_name(item, allow_suffixless=True)
        if agg is None:
            raise PhiParseError(
                f"select item {item!r} is neither a grouping attribute, an "
                f"F-vect aggregate, nor a parseable group-0 aggregate "
                f"(<fn>_<src>); the reference's own query 1 trips this — "
                f"SURVEY.md §2.4 B1"
            )
        group0.append(agg)

    slots = _split_slots(lines[4])
    if len(slots) < n:
        raise PhiParseError(f"such-that line has {len(slots)} slots; need ≥ n={n}")
    gvs: list[GroupingVar] = []
    for i in range(n):
        conds = [parse_condition(c, known_cols) for c in slots[i].split(":") if c.strip()]
        mf_conds = [c for c in conds if c.right.kind == "mf" or c.left.kind == "mf"]
        tuple_conds = [c for c in conds if c.right.kind != "mf" and c.left.kind != "mf"]
        gv = GroupingVar(index=i + 1, agg=gv_aggs[i], mf_conds=mf_conds, tuple_conds=tuple_conds)
        if not gv.mf_conds:
            # Implicit same-group join (reference: QueryProcessor1.java:216-226):
            # a GV with only sigma conditions ranges over its own group.
            gv.mf_conds = [
                Cond(
                    left=Operand(kind="col", name=g),
                    op="==",
                    right=Operand(kind="mf", name=g),
                )
                for g in group_attrs
            ]
            gv.synthesized = True
        gvs.append(gv)

    # Slots beyond n are the global WHERE (reference keeps exactly one slot;
    # we AND any number of extra slots/conditions — superset, B8).
    where: list[Cond] = []
    for slot in slots[n:]:
        for c in slot.split(":"):
            if c.strip():
                where.append(parse_condition(c, known_cols))

    q = PhiQuery(select=select, group_attrs=group_attrs, group0=group0, gvs=gvs, where=where)
    if len(lines) == 6:
        q.having = parse_having(lines[5], set(q.output_fields()))
    return q


def parse_queries(text: str, known_cols: set[str] | None = None) -> list[PhiQuery]:
    """Parse a multi-query file: blocks separated by a ``~`` line
    (reference separator const at src/AdhocQueryProcessor.java:34)."""
    queries = []
    for block in text.split(_QUERY_SEP):
        lines = [ln for ln in block.splitlines() if ln.strip()]
        if lines:
            queries.append(parse_query(lines, known_cols))
    return queries
