"""Parser unit tests: golden corpus round-trips, operand normalization,
implicit-MF synthesis, the reference's malformed query 1 (B1)."""

from __future__ import annotations

import pytest

from ad_hoc_olap_query_processing_engine_spark.phi import (
    GOLDEN_SPECS,
    PhiParseError,
    golden_queries,
    parse_queries,
    parse_query,
)
from ad_hoc_olap_query_processing_engine_spark.phi.goldens import SALES_COLUMNS
from ad_hoc_olap_query_processing_engine_spark.phi.parser import parse_condition

REFERENCE_CORPUS = "/root/reference/src/Ad_hoc_Input.txt"


def test_golden_specs_parse():
    qs = golden_queries()
    assert set(qs) == {f"phi_q{i}" for i in range(1, 7)}


def test_q1_structure():
    q = golden_queries()["phi_q1"]
    assert q.group_attrs == ["cust"]
    assert [a.name for a in q.group0] == ["avg_quant"]
    assert q.n == 3
    assert [gv.agg.fn for gv in q.gvs] == ["avg"] * 3
    assert [gv.agg.src for gv in q.gvs] == ["quant"] * 3
    assert not q.where and q.having is None
    # each GV: one same-group MF equality + one state sigma
    for gv, state in zip(q.gvs, ("NY", "CT", "NJ")):
        assert len(gv.mf_conds) == 1 and len(gv.tuple_conds) == 1
        tc = gv.tuple_conds[0]
        assert tc.left.name == "state" and tc.op == "==" and tc.right.value == state


def test_q2_superset_and_where():
    q = golden_queries()["phi_q2"]
    assert q.group_attrs == ["prod", "month"]
    assert len(q.gvs[0].mf_conds) == 2  # prod AND month equality
    assert len(q.gvs[1].mf_conds) == 1  # prod only: superset GV
    assert len(q.where) == 1
    w = q.where[0]
    assert w.left.name == "year" and w.op == "==" and w.right.value == 1997


def test_q3_theta_direction():
    q = golden_queries()["phi_q3"]
    before = q.gvs[0]
    theta = [c for c in before.mf_conds if c.op != "=="]
    assert len(theta) == 1
    # {MF.month.avg_quant_before}[<]{month} == tuple.month < group.month
    c = theta[0]
    assert c.left.kind == "col" and c.left.name == "month"
    assert c.op == "<"
    assert c.right.kind == "mf" and c.right.name == "month"


def test_q4_anti_condition():
    q = golden_queries()["phi_q4"]
    anti = [c for c in q.gvs[1].mf_conds if c.op == "!="]
    assert len(anti) == 1 and anti[0].right.name == "cust"


def test_q5_synthesized_default_group():
    q = golden_queries()["phi_q5"]
    for gv in q.gvs:
        assert gv.synthesized
        assert [(c.left.name, c.op, c.right.name) for c in gv.mf_conds] == [
            ("cust", "==", "cust")
        ]
    assert q.having is not None and q.having.op == "and"
    assert all(ch.op == "leaf" for ch in q.having.children)


def test_q6_dependent_and_having_literal():
    q = golden_queries()["phi_q6"]
    dep = [c for c in q.gvs[1].mf_conds if c.right.name == "avg_quant_1"]
    assert len(dep) == 1
    # {MF.avg_quant_1.count_quant_2}[>]{quant} == tuple.quant > group.avg_quant_1
    assert dep[0].left.name == "quant" and dep[0].op == ">"
    leaf = q.having
    assert leaf.op == "leaf"
    assert leaf.cond.left.name == "count_quant_2" and leaf.cond.right.value == 0


def test_reference_corpus_verbatim():
    """Queries 2-6 of the reference's own input file parse verbatim; query 1
    is malformed (B1 in SURVEY.md §2.4) and must fail loudly, not crash the
    way the reference's generated code does."""
    text = open(REFERENCE_CORPUS).read()
    blocks = [b for b in text.split("~") if b.strip()]
    assert len(blocks) == 6
    with pytest.raises(PhiParseError):
        parse_query(blocks[0].splitlines(), known_cols=SALES_COLUMNS)
    parsed = [
        parse_query(b.splitlines(), known_cols=SALES_COLUMNS) for b in blocks[1:]
    ]
    golden = golden_queries()
    for i, q in enumerate(parsed, start=2):
        assert q == golden[f"phi_q{i}"]


def test_multi_query_file_split():
    text = "\n~\n".join(GOLDEN_SPECS[f"phi_q{i}"] for i in (2, 5, 6))
    qs = parse_queries(text, known_cols=SALES_COLUMNS)
    assert [q.n for q in qs] == [2, 3, 2]


def test_operand_typing():
    c = parse_condition("{quant}[>=]{10}", SALES_COLUMNS)
    assert c.right.value == 10 and isinstance(c.right.value, int)
    c = parse_condition("{state}[=]{NY}", SALES_COLUMNS)
    assert c.right.value == "NY"
    c = parse_condition("{quant}[>]{1.5}", SALES_COLUMNS)
    assert c.right.value == 1.5


def test_mf_vs_mf_condition():
    c = parse_condition("{MF.avg_a.x}[<]{MF.avg_b.y}", SALES_COLUMNS)
    assert c.left.kind == "mf" and c.right.kind == "mf"


def test_bad_operator_rejected():
    with pytest.raises(PhiParseError):
        parse_condition("{quant}[~~]{10}", SALES_COLUMNS)


def test_having_parentheses_override_left_fold():
    from ad_hoc_olap_query_processing_engine_spark.phi.parser import parse_having

    fields = {"a", "b", "c"}
    nested = parse_having("{MF.a,>,1} && ({MF.b,>,2} || {MF.c,>,3})", fields)
    assert nested.op == "and"
    assert nested.children[1].op == "or"
    # without parens the same chain left-folds: ((a && b) || c)
    flat = parse_having("{MF.a,>,1} && {MF.b,>,2} || {MF.c,>,3}", fields)
    assert flat.op == "or"
    assert flat.children[0].op == "and"


def test_having_unbalanced_parens_raise():
    import pytest

    from ad_hoc_olap_query_processing_engine_spark.phi.parser import (
        PhiParseError,
        parse_having,
    )

    with pytest.raises(PhiParseError):
        parse_having("({MF.a,>,1} && {MF.b,>,2}", {"a", "b"})
    with pytest.raises(PhiParseError):
        parse_having("{MF.a,>,1}) && {MF.b,>,2}", {"a", "b"})
