"""The six golden Phi queries (reference: src/Ad_hoc_Input.txt).

Queries 2–6 are VERBATIM from the reference corpus. Query 1's select line is
corrupt in the reference (``cust,prod,avg,quant_NY,...`` — a typo'd
``avg_quant_NY`` that makes the generated QueryProcessor1 crash; SURVEY.md
§2.4 B1); GOLDEN_Q1 below is the intended query: per-customer overall average
quantity (group-0) plus per-state conditional averages.

The literals (states NY/CT/NJ, year 1997) work unchanged against the driver
test data because the `sales` derivation view maps the three most populous
nations to those state names and 1997 exists in ``o_orderdate``
(sources/catalog.py).
"""

from __future__ import annotations

from .ast import PhiQuery
from .parser import parse_query

# B1 fix: select = cust + group-0 avg_quant + the three GV aggregates.
GOLDEN_Q1 = """\
cust,avg_quant,avg_quant_NY,avg_quant_CT,avg_quant_NJ
3
cust
avg_quant_NY,avg_quant_CT,avg_quant_NJ
{MF.cust.avg_quant_NY}[=]{cust}:{state}[=]{NY},{MF.cust.avg_quant_CT}[=]{cust}:{state}[=]{CT},{MF.cust.avg_quant_NJ}[=]{cust}:{state}[=]{NJ}"""

# Verbatim reference: src/Ad_hoc_Input.txt:7-11
GOLDEN_Q2 = """\
prod,month,sum_quant_1,sum_quant_tot
2
prod,month
sum_quant_1,sum_quant_tot
{MF.prod.sum_quant_1}[=]{prod}:{MF.month.sum_quant_1}[=]{month},{MF.prod.sum_quant_tot}[=]{prod},{year}[==]{1997}"""

# Verbatim reference: src/Ad_hoc_Input.txt:13-17
GOLDEN_Q3 = """\
cust,month,avg_quant,avg_quant_before,avg_quant_after
2
cust,month
avg_quant_before,avg_quant_after
{MF.cust.avg_quant_before}[=]{cust}:{MF.month.avg_quant_before}[<]{month},{MF.cust.avg_quant_after}[=]{cust}:{MF.month.avg_quant_after}[>]{month},{year}[==]{1997}"""

# Verbatim reference: src/Ad_hoc_Input.txt:19-23
GOLDEN_Q4 = """\
cust,prod,avg_quant_sale,avg_quant_othrcustsale
2
cust,prod
avg_quant_sale,avg_quant_othrcustsale
{MF.cust.avg_quant_sale}[=]{cust}:{MF.prod.avg_quant_sale}[=]{prod},{MF.prod.avg_quant_othrcustsale}[=]{prod}:{MF.cust.avg_quant_othrcustsale}[!=]{cust}"""

# Verbatim reference: src/Ad_hoc_Input.txt:25-30
GOLDEN_Q5 = """\
cust,avg_quant_NY,avg_quant_CT,avg_quant_NJ
3
cust
avg_quant_NY,avg_quant_CT,avg_quant_NJ
{state}[=]{NY},{state}[=]{CT},{state}[=]{NJ},{year}[==]{1997}
{avg_quant_NY,>,avg_quant_CT} [&&] {avg_quant_NY,>,avg_quant_NJ}"""

# Verbatim reference: src/Ad_hoc_Input.txt:32-37
GOLDEN_Q6 = """\
prod,month,avg_quant_1,count_quant_2
2
prod,month
avg_quant_1,count_quant_2
{MF.prod.avg_quant_1}[=]{prod}:{MF.month.avg_quant_1}[=]{month},{MF.prod.count_quant_2}[=]{prod}:{MF.month.count_quant_2}[=]{month}:{MF.avg_quant_1.count_quant_2}[>]{quant},{year}[==]{1997}
{MF.count_quant_2,>,0}"""

GOLDEN_SPECS: dict[str, str] = {
    "phi_q1": GOLDEN_Q1,
    "phi_q2": GOLDEN_Q2,
    "phi_q3": GOLDEN_Q3,
    "phi_q4": GOLDEN_Q4,
    "phi_q5": GOLDEN_Q5,
    "phi_q6": GOLDEN_Q6,
}

# Engine-extension Φ queries — NOT from the reference corpus; they exercise
# planner strategies beyond what the six goldens reach (still plain Φ-spec
# language, still oracle-checked through the generated sqlgen SQL).
#
# phi_q7: per (year, month) —
#   GV1 sum_quant_prior: TWO θ-conditions (year' <= year AND month' < month),
#       which no single range frame encodes → GROUP_JOIN strategy.
#   GV2 min_quant_other: same month in a DIFFERENT year (eq + anti) with a
#       min aggregate, which the WINDOW complement can't decompose →
#       GROUP_JOIN strategy.
# Both stay at ONE scan of the fact table (pinned in test_plans.py).
EXTENSION_Q7 = """\
year,month,sum_quant_prior,min_quant_other
2
year,month
sum_quant_prior,min_quant_other
{MF.year.sum_quant_prior}[<=]{year}:{MF.month.sum_quant_prior}[<]{month},{MF.month.min_quant_other}[=]{month}:{MF.year.min_quant_other}[!=]{year}"""

# phi_q8: per (prod, month) with a group-0 avg_quant —
#   GV1 sum_quant_himonth: same prod, from months NUMERICALLY GREATER than
#       this group's earliest sale day ({MF.min_day.·}[>]{month} — a grouping
#       attribute compared against the anchor's group-0 aggregate; min_day
#       spans 1..31 so the predicate genuinely flips per group).
#   GV2 count_quant_prior: same prod, earlier month (same-attr θ) AND month
#       ≤ this group's earliest sale day (θ + group-level mix).
# Membership depends on tuples only through their group identity, so both
# GVs take the GROUP_JOIN strategy (group-table self-join carrying the
# anchor's group-0 field) — one fact scan, no sales re-join (pinned in
# test_plans.py).
EXTENSION_Q8 = """\
prod,month,avg_quant,min_day,sum_quant_himonth,count_quant_prior
2
prod,month
sum_quant_himonth,count_quant_prior
{MF.prod.sum_quant_himonth}[=]{prod}:{MF.min_day.sum_quant_himonth}[>]{month},{MF.prod.count_quant_prior}[=]{prod}:{MF.month.count_quant_prior}[<]{month}:{MF.min_day.count_quant_prior}[<=]{month}"""

# phi_q9: per (cust, month) with a group-0 avg_quant — the TEXTBOOK EMF
# "relative to own average" query:
#   GV1 count_quant_below: this group's sales strictly below the group's own
#       average quantity ({MF.avg_quant.·}[<]{quant} — a tuple-level
#       condition against the anchor's group-0 aggregate).
#   GV2 sum_quant_above: quantity sold at-or-above the group's own average.
# Both GVs are pinned to their own group (equalities on cust AND month), so
# they take the FACT_WINDOW strategy: avg_quant attaches to each fact row
# via a partitionBy(V) window sharing the scan-0 shuffle — one fact pass,
# no join back against sales (pinned in test_plans.py).
EXTENSION_Q9 = """\
cust,month,avg_quant,count_quant_below,sum_quant_above
2
cust,month
count_quant_below,sum_quant_above
{MF.cust.count_quant_below}[=]{cust}:{MF.month.count_quant_below}[=]{month}:{MF.avg_quant.count_quant_below}[<]{quant},{MF.cust.sum_quant_above}[=]{cust}:{MF.month.sum_quant_above}[=]{month}:{MF.avg_quant.sum_quant_above}[>=]{quant}"""

# phi_q10: per (prod, year) — the strategy-COMPOSITION stress: three GVs
# that each take a DIFFERENT planner strategy inside one query, plus HAVING:
#   GV1 avg_quant_NY: own group, tuple-σ state='NY' → COND_AGG (fused into
#       scan 0 as avg(CASE WHEN ...)).
#   GV2 sum_quant_allyears: same prod across ALL years (superset of the
#       group) → WINDOW (partition-by-prod total over the group table).
#   GV3 count_quant_hot: tuples of the group with quant above the group's
#       GV1 average — a DEPENDENT aggregate (references avg_quant_NY), so
#       it stages after GV1 via JOIN_AGG, exactly the Q6 mechanism but
#       depending on a CONDITIONAL aggregate rather than a plain one.
#   HAVING keeps groups where the dependent count is positive (groups with
#       no NY sales have NULL avg → NULL-condition semantics filter them).
EXTENSION_Q10 = """\
prod,year,avg_quant_NY,sum_quant_allyears,count_quant_hot
3
prod,year
avg_quant_NY,sum_quant_allyears,count_quant_hot
{MF.prod.avg_quant_NY}[=]{prod}:{MF.year.avg_quant_NY}[=]{year}:{state}[=]{NY},{MF.prod.sum_quant_allyears}[=]{prod},{MF.prod.count_quant_hot}[=]{prod}:{MF.year.count_quant_hot}[=]{year}:{MF.avg_quant_NY.count_quant_hot}[<]{quant}
{MF.count_quant_hot,>,0}"""

# phi_q11: per (year, month) — the GROUP_JOIN × group-0-HAVING crossing as a
# REGISTERED golden (round 8; previously covered only by the derandomized
# property suite): GV1 count_quant_past θ-compares BOTH grouping attributes
# ({MF.year.·}[<=]{year} AND {MF.month.·}[<]{month} → GROUP_JOIN over the
# group table, one fact scan), GV2 is a σ-conditioned COND_AGG, and the
# HAVING tree mixes group-0 aggregates (min_day, sum_quant) with the
# GROUP_JOIN GV across nested &&/|| — the interaction the round-7 verdict
# flagged as resting on generated specs alone.
EXTENSION_Q11 = """\
year,month,min_day,sum_quant,count_quant_past,sum_quant_NY
2
year,month
count_quant_past,sum_quant_NY
{MF.year.count_quant_past}[<=]{year}:{MF.month.count_quant_past}[<]{month},{MF.year.sum_quant_NY}[=]{year}:{MF.month.sum_quant_NY}[=]{month}:{state}[=]{NY}
({MF.min_day,<,15} [&&] {MF.count_quant_past,>,0}) [||] {MF.sum_quant,>,500}"""

EXTENSION_SPECS: dict[str, str] = {
    "phi_q7": EXTENSION_Q7,
    "phi_q8": EXTENSION_Q8,
    "phi_q9": EXTENSION_Q9,
    "phi_q10": EXTENSION_Q10,
    "phi_q11": EXTENSION_Q11,
}

SALES_COLUMNS = {"cust", "prod", "day", "month", "year", "state", "quant"}


def golden_queries() -> dict[str, PhiQuery]:
    return {
        name: parse_query(spec.splitlines(), known_cols=SALES_COLUMNS)
        for name, spec in GOLDEN_SPECS.items()
    }


def all_phi_queries() -> dict[str, PhiQuery]:
    """Golden (reference-corpus) queries plus engine-extension queries."""
    return {
        name: parse_query(spec.splitlines(), known_cols=SALES_COLUMNS)
        for name, spec in {**GOLDEN_SPECS, **EXTENSION_SPECS}.items()
    }
