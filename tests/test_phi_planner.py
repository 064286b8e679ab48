"""Planner unit tests on a synthetic fixture: strategy classification, null
policy (B4), negative data (the reference's 0-sentinel bug), theta frames,
anti-group complements, dependent aggregates — each cross-checked against the
generated oracle SQL run on DuckDB over the exact same rows."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ad_hoc_olap_query_processing_engine_spark.phi import compile_phi, parse_query, phi_to_sql
from ad_hoc_olap_query_processing_engine_spark.phi.planner import classify_gv

from .conftest import assert_frames_match

COLS = {"cust", "prod", "day", "month", "year", "state", "quant"}


def _fixture_pdf() -> pd.DataFrame:
    rows = []
    rng_states = ["NY", "CT", "NJ", "TX"]
    quant_cycle = [-50, -3, 0, 1, 7, 7, 12, 40, 100, 3]
    i = 0
    for cust in ["alice", "bob", "carol", "ab"]:
        for prod in ["pen", "ink", "cab"]:
            # deliberate empty combos: carol never buys cab in 1997
            for month in [1, 2, 3, 6, 11]:
                if cust == "carol" and prod == "cab":
                    continue
                for year in [1996, 1997]:
                    rows.append(
                        dict(
                            cust=cust,
                            prod=prod,
                            day=(i % 28) + 1,
                            month=month,
                            year=year,
                            state=rng_states[i % 4],
                            quant=quant_cycle[i % len(quant_cycle)],
                        )
                    )
                    i += 1
    # group-key concat collision probe (B7): ("a","bc") vs ("ab","c")
    rows.append(dict(cust="a", prod="bc", day=1, month=1, year=1997, state="NY", quant=5))
    rows.append(dict(cust="ab", prod="c", day=1, month=1, year=1997, state="NY", quant=9))
    # NULL grouping keys: membership equality is null-safe (NULL-keyed tuples
    # belong to the NULL-keyed group) — locks planner/oracle agreement
    rows.append(dict(cust=None, prod="pen", day=2, month=1, year=1997, state="NY", quant=11))
    rows.append(dict(cust=None, prod="pen", day=3, month=2, year=1997, state="CT", quant=13))
    rows.append(dict(cust="alice", prod=None, day=4, month=3, year=1997, state=None, quant=17))
    # NULL aggregate sources: AVG must ignore NULLs in its denominator (the
    # window strategy's partial-count fix) and SUM/MIN/MAX skip them — every
    # strategy sees these through the oracle cross-check.
    rows.append(dict(cust="alice", prod="pen", day=5, month=1, year=1997, state="NY", quant=None))
    rows.append(dict(cust="bob", prod="ink", day=6, month=2, year=1996, state="CT", quant=None))
    rows.append(dict(cust="carol", prod="pen", day=7, month=6, year=1997, state="NJ", quant=None))
    pdf = pd.DataFrame(rows)
    # keep quant integral-with-NULLs (object dtype → Spark LongType nullable,
    # DuckDB BIGINT) — a float64 NaN column would silently change SUM dtype
    pdf["quant"] = pdf["quant"].astype(object).where(pdf["quant"].notna(), None)
    return pdf


@pytest.fixture(scope="module")
def fixture_sales(spark):
    pdf = _fixture_pdf()
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("sales_fixture", pdf)
    return sdf, con


def check(spec: str, fixture_sales):
    sdf, con = fixture_sales
    q = parse_query(spec.splitlines(), known_cols=COLS)
    got = compile_phi(q, sdf).toPandas()
    exp = con.sql(phi_to_sql(q, relation_name="sales_fixture")).fetchdf()
    assert_frames_match(got, exp)
    return q, got


# ---------------------------------------------------------------- strategies


def test_classify_cond_agg():
    q = parse_query(
        ["cust,avg_quant_NY", "1", "cust", "avg_quant_NY",
         "{MF.cust.avg_quant_NY}[=]{cust}:{state}[=]{NY}"],
        known_cols=COLS,
    )
    assert classify_gv(q.gvs[0], q.group_attrs).strategy == "cond_agg"


def test_classify_window_superset():
    q = parse_query(
        ["prod,month,sum_quant_tot", "1", "prod,month", "sum_quant_tot",
         "{MF.prod.sum_quant_tot}[=]{prod}"],
        known_cols=COLS,
    )
    p = classify_gv(q.gvs[0], q.group_attrs)
    assert p.strategy == "window" and p.eq_attrs == ["prod"] and p.theta is None


def test_classify_window_theta():
    q = parse_query(
        ["cust,month,avg_quant_before", "1", "cust,month", "avg_quant_before",
         "{MF.cust.avg_quant_before}[=]{cust}:{MF.month.avg_quant_before}[<]{month}"],
        known_cols=COLS,
    )
    p = classify_gv(q.gvs[0], q.group_attrs)
    assert p.strategy == "window" and p.theta == ("month", "<")


def test_classify_strict_theta_requires_integral_dtype():
    q = parse_query(
        ["cust,month,avg_quant_before", "1", "cust,month", "avg_quant_before",
         "{MF.cust.avg_quant_before}[=]{cust}:{MF.month.avg_quant_before}[<]{month}"],
        known_cols=COLS,
    )
    # strict < compiles to a ±1 range frame — only valid when the ordering
    # attribute is integral; anything else takes the group-table θ-join path
    # (still a single fact scan, dtype-independent comparisons)
    assert classify_gv(q.gvs[0], q.group_attrs, {"month": "int"}).strategy == "window"
    assert classify_gv(q.gvs[0], q.group_attrs, {"month": "double"}).strategy == "group_join"
    assert classify_gv(q.gvs[0], q.group_attrs, {"month": "string"}).strategy == "group_join"
    # non-strict ops keep the window path for any orderable type (their
    # frames use only unbounded/current-row boundaries — no offset arithmetic)
    q2 = parse_query(
        ["cust,month,avg_quant_upto", "1", "cust,month", "avg_quant_upto",
         "{MF.cust.avg_quant_upto}[=]{cust}:{MF.month.avg_quant_upto}[<=]{month}"],
        known_cols=COLS,
    )
    assert classify_gv(q2.gvs[0], q2.group_attrs, {"month": "double"}).strategy == "window"


def test_classify_anti_minmax_takes_group_join():
    # min/max with an anti condition can't use the WINDOW complement
    # subtraction, but min-of-partial-mins over the group-table θ-join works.
    q = parse_query(
        ["cust,prod,max_quant_o", "1", "cust,prod", "max_quant_o",
         "{MF.prod.max_quant_o}[=]{prod}:{MF.cust.max_quant_o}[!=]{cust}"],
        known_cols=COLS,
    )
    assert classify_gv(q.gvs[0], q.group_attrs).strategy == "group_join"


def test_classify_two_thetas_takes_group_join():
    q = parse_query(
        ["year,month,sum_quant_p", "1", "year,month", "sum_quant_p",
         "{MF.year.sum_quant_p}[<=]{year}:{MF.month.sum_quant_p}[<]{month}"],
        known_cols=COLS,
    )
    p = classify_gv(q.gvs[0], q.group_attrs, {"year": "int", "month": "int"})
    assert p.strategy == "group_join"
    assert p.thetas == [("year", "<="), ("month", "<")]


def test_classify_theta_plus_anti_takes_group_join():
    q = parse_query(
        ["cust,month,avg_quant_x", "1", "cust,month", "avg_quant_x",
         "{MF.month.avg_quant_x}[<]{month}:{MF.cust.avg_quant_x}[!=]{cust}"],
        known_cols=COLS,
    )
    p = classify_gv(q.gvs[0], q.group_attrs, {"cust": "string", "month": "bigint"})
    assert p.strategy == "group_join"
    assert p.thetas == [("month", "<")] and p.anti_attrs == ["cust"]


# -------------------------------------------------- group_join correctness


def test_group_join_two_thetas(fixture_sales):
    # Σ quant over groups earlier-or-equal in year AND strictly earlier in
    # month — a 2-D cumulative no single range frame encodes.
    spec = (
        "year,month,sum_quant_p,avg_quant_p\n2\nyear,month\n"
        "sum_quant_p,avg_quant_p\n"
        "{MF.year.sum_quant_p}[<=]{year}:{MF.month.sum_quant_p}[<]{month},"
        "{MF.year.avg_quant_p}[<=]{year}:{MF.month.avg_quant_p}[<]{month}"
    )
    q, got = check(spec, fixture_sales)
    assert all(
        classify_gv(gv, q.group_attrs).strategy == "group_join" for gv in q.gvs
    )


def test_group_join_anti_minmax(fixture_sales):
    # max over OTHER customers of the same product — min/max + anti, with
    # NULL-keyed groups in the fixture exercising the null-safe membership.
    spec = (
        "cust,prod,max_quant_o,min_quant_o\n2\ncust,prod\n"
        "max_quant_o,min_quant_o\n"
        "{MF.prod.max_quant_o}[=]{prod}:{MF.cust.max_quant_o}[!=]{cust},"
        "{MF.prod.min_quant_o}[=]{prod}:{MF.cust.min_quant_o}[!=]{cust}"
    )
    check(spec, fixture_sales)


def test_group_join_theta_anti_mix(fixture_sales):
    spec = (
        "cust,month,sum_quant_x,count_quant_x\n2\ncust,month\n"
        "sum_quant_x,count_quant_x\n"
        "{MF.month.sum_quant_x}[<]{month}:{MF.cust.sum_quant_x}[!=]{cust},"
        "{MF.month.count_quant_x}[<]{month}:{MF.cust.count_quant_x}[!=]{cust}"
    )
    check(spec, fixture_sales)


def test_classify_dependent_is_join():
    q = parse_query(
        ["prod,avg_quant_1,count_quant_2", "2", "prod", "avg_quant_1,count_quant_2",
         "{MF.prod.avg_quant_1}[=]{prod},"
         "{MF.prod.count_quant_2}[=]{prod}:{MF.avg_quant_1.count_quant_2}[>]{quant}"],
        known_cols=COLS,
    )
    assert classify_gv(q.gvs[0], q.group_attrs).strategy == "cond_agg"
    assert classify_gv(q.gvs[1], q.group_attrs).strategy == "join"


# ------------------------------------------------------------- null policy


def test_empty_group_null_for_avg_zero_for_count(fixture_sales):
    # carol/cab never occurs; conditional aggregates over an absent state.
    spec = (
        "cust,prod,avg_quant_ZZ,count_quant_ZZ\n2\ncust,prod\n"
        "avg_quant_ZZ,count_quant_ZZ\n"
        "{MF.cust.avg_quant_ZZ}[=]{cust}:{MF.prod.avg_quant_ZZ}[=]{prod}:{state}[=]{ZZ},"
        "{MF.cust.count_quant_ZZ}[=]{cust}:{MF.prod.count_quant_ZZ}[=]{prod}:{state}[=]{ZZ}"
    )
    _, got = check(spec, fixture_sales)
    assert got["avg_quant_ZZ"].isna().all()
    assert (got["count_quant_ZZ"] == 0).all()


def test_min_max_with_negative_data(fixture_sales):
    # the reference's 0-sentinel would corrupt these (B4)
    spec = (
        "cust,min_quant_a,max_quant_a\n2\ncust\nmin_quant_a,max_quant_a\n"
        "{state}[=]{NY},{state}[=]{NY}"
    )
    _, got = check(spec, fixture_sales)
    assert (got["min_quant_a"].dropna() < 0).any()


# ------------------------------------------------------------------ windows


@pytest.mark.parametrize("op", ["<", "<=", ">", ">="])
def test_theta_frames_all_ops(op, fixture_sales):
    spec = (
        f"cust,month,sum_quant_t,count_quant_t\n2\ncust,month\n"
        f"sum_quant_t,count_quant_t\n"
        f"{{MF.cust.sum_quant_t}}[=]{{cust}}:{{MF.month.sum_quant_t}}[{op}]{{month}},"
        f"{{MF.cust.count_quant_t}}[=]{{cust}}:{{MF.month.count_quant_t}}[{op}]{{month}}"
    )
    check(spec, fixture_sales)


def test_theta_min_max_window(fixture_sales):
    spec = (
        "cust,month,min_quant_b,max_quant_b\n2\ncust,month\nmin_quant_b,max_quant_b\n"
        "{MF.cust.min_quant_b}[=]{cust}:{MF.month.min_quant_b}[<]{month},"
        "{MF.cust.max_quant_b}[=]{cust}:{MF.month.max_quant_b}[<]{month}"
    )
    check(spec, fixture_sales)


def test_anti_with_extra_grouping_attr(fixture_sales):
    """V={cust,prod,month}, S={prod}, anti on cust: the complement must
    subtract partition(S+anti) totals, not just the group's own partial."""
    spec = (
        "cust,prod,month,avg_quant_o\n1\ncust,prod,month\navg_quant_o\n"
        "{MF.prod.avg_quant_o}[=]{prod}:{MF.cust.avg_quant_o}[!=]{cust}"
    )
    check(spec, fixture_sales)


def test_global_anti_no_partition(fixture_sales):
    """S empty: 'tuples of all other customers' across every prod."""
    spec = (
        "cust,sum_quant_o,count_quant_o\n2\ncust\nsum_quant_o,count_quant_o\n"
        "{MF.cust.sum_quant_o}[!=]{cust},{MF.cust.count_quant_o}[!=]{cust}"
    )
    check(spec, fixture_sales)


def test_anti_with_tuple_sigma(fixture_sales):
    spec = (
        "cust,prod,avg_quant_o\n1\ncust,prod\navg_quant_o\n"
        "{MF.prod.avg_quant_o}[=]{prod}:{MF.cust.avg_quant_o}[!=]{cust}:{state}[=]{NY}"
    )
    check(spec, fixture_sales)


# ----------------------------------------------------------------- join path


def test_join_path_minmax_anti(fixture_sales):
    spec = (
        "cust,prod,max_quant_o\n1\ncust,prod\nmax_quant_o\n"
        "{MF.prod.max_quant_o}[=]{prod}:{MF.cust.max_quant_o}[!=]{cust}"
    )
    check(spec, fixture_sales)


def test_dependent_on_group0(fixture_sales):
    """GV predicate referencing the group-0 aggregate forces a staged join."""
    spec = (
        "cust,avg_quant,count_quant_hi\n1\ncust\ncount_quant_hi\n"
        "{MF.cust.count_quant_hi}[=]{cust}:{MF.avg_quant.count_quant_hi}[<]{quant},"
        "{year}[==]{1997}"
    )
    check(spec, fixture_sales)


def test_mf_field_vs_literal_join(fixture_sales):
    """A literal compared against an MF grouping field (join fallback)."""
    spec = (
        "cust,month,count_quant_m\n1\ncust,month\ncount_quant_m\n"
        "{MF.cust.count_quant_m}[=]{cust}:{MF.month.count_quant_m}[>=]{3}"
    )
    check(spec, fixture_sales)


def test_group_key_collision_b7(fixture_sales):
    """("a","bc") and ("ab","c") must stay distinct groups (the reference's
    string-concat keys collide — B7)."""
    spec = (
        "cust,prod,count_quant_x\n1\ncust,prod\ncount_quant_x\n"
        "{MF.cust.count_quant_x}[=]{cust}:{MF.prod.count_quant_x}[=]{prod}"
    )
    _, got = check(spec, fixture_sales)
    keys = set(zip(got["cust"], got["prod"]))
    assert ("a", "bc") in keys and ("ab", "c") in keys


def test_generic_phi_api_on_any_dataframe(spark, duck):
    """phi() runs a Φ-spec against an arbitrary DataFrame (here: events)."""
    from ad_hoc_olap_query_processing_engine_spark.phi import phi
    from ad_hoc_olap_query_processing_engine_spark.sources import catalog
    from .conftest import SF_SMALL, assert_frames_match

    ev = catalog.load_table(spark, "events", SF_SMALL)
    spec = (
        "event_type,count_value_hi,avg_value_all\n1\nevent_type\ncount_value_hi\n"
        "{MF.event_type.count_value_hi}[=]{event_type}:{value}[>]{50}"
    )
    got = phi(ev, spec).toPandas()
    exp = duck(SF_SMALL).sql("""
        WITH g AS (SELECT event_type, CAST(AVG(value) AS DOUBLE) AS avg_value_all
                   FROM events GROUP BY event_type),
        c AS (SELECT event_type, COUNT(*) AS count_value_hi FROM events
              WHERE value > 50 GROUP BY event_type)
        SELECT g.event_type, COALESCE(c.count_value_hi, 0) AS count_value_hi,
               g.avg_value_all
        FROM g LEFT JOIN c ON g.event_type = c.event_type
    """).fetchdf()
    assert_frames_match(got, exp)


def test_null_group_keys_receive_aggregates(fixture_sales):
    """NULL-keyed groups exist (GROUP BY semantics) and their MF aggregates
    are computed, not silently NULL'd by non-null-safe joins."""
    spec = (
        "cust,count_quant_x,avg_quant_x\n2\ncust\ncount_quant_x,avg_quant_x\n"
        "{MF.cust.count_quant_x}[=]{cust},{MF.cust.avg_quant_x}[=]{cust},{year}[==]{1997}"
    )
    _, got = check(spec, fixture_sales)
    null_rows = got[got["cust"].isna()]
    assert len(null_rows) == 1
    assert null_rows["count_quant_x"].iloc[0] == 2  # both NULL-cust 1997 rows
    assert abs(null_rows["avg_quant_x"].iloc[0] - 12.0) < 1e-9  # (11+13)/2


def test_null_keys_through_dependent_stage(fixture_sales):
    """NULL groups also survive the staged join path (dependent aggregate)."""
    spec = (
        "cust,avg_quant_1,count_quant_2\n2\ncust\navg_quant_1,count_quant_2\n"
        "{MF.cust.avg_quant_1}[=]{cust},"
        "{MF.cust.count_quant_2}[=]{cust}:{MF.avg_quant_1.count_quant_2}[<]{quant},"
        "{year}[==]{1997}"
    )
    _, got = check(spec, fixture_sales)
    null_rows = got[got["cust"].isna()]
    assert len(null_rows) == 1
    assert null_rows["count_quant_2"].iloc[0] == 1  # 13 > avg 12


def test_classify_pinned_rowcond_is_fact_window():
    # pinned to its own group on every grouping attr + a tuple column vs the
    # anchor's group-0 aggregate → FACT_WINDOW (one fact pass, windowed g0)
    q = parse_query(
        ["cust,month,avg_quant,count_quant_lo", "1", "cust,month",
         "count_quant_lo",
         "{MF.cust.count_quant_lo}[=]{cust}:{MF.month.count_quant_lo}[=]{month}"
         ":{MF.avg_quant.count_quant_lo}[<]{quant}"],
        known_cols=COLS,
    )
    g0 = frozenset(a.name for a in q.group0)
    p = classify_gv(q.gvs[0], q.group_attrs, g0_names=g0)
    assert p.strategy == "fact_window"
    assert len(p.rowconds) == 1


def test_classify_unpinned_rowcond_stays_join():
    # same tuple-level condition but membership NOT pinned on month → the
    # anchor group differs from the row's own group → staged JOIN_AGG
    q = parse_query(
        ["cust,month,avg_quant,count_quant_lo", "1", "cust,month",
         "count_quant_lo",
         "{MF.cust.count_quant_lo}[=]{cust}"
         ":{MF.avg_quant.count_quant_lo}[<]{quant}"],
        known_cols=COLS,
    )
    g0 = frozenset(a.name for a in q.group0)
    assert classify_gv(q.gvs[0], q.group_attrs, g0_names=g0).strategy == "join"
