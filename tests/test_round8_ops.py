"""Round-8 late additions: kernel/constant properties and small-data
invariants for rel_skyline, rel_benford_check, ts_rolling_zscore and
pipe_dp_noise.  The DuckDB hash parity itself is the driver contract
(scripts/crosscheck.py); these tests pin the ALGEBRA the Spark
formulations rely on, so a future rewrite can't silently change semantics
while still agreeing with a rewritten oracle.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from ad_hoc_olap_query_processing_engine_spark.operators.olap import _BENFORD_E5
from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
    _DP_B,
    _DP_T,
)

from .conftest import SF_SMALL

# ---------------------------------------------------------------------------
# rel_skyline: the windowed 2-D formulation (per-size min price, keep iff
# every strictly larger size is strictly dearer) must equal the textbook
# all-pairs dominance filter the DuckDB oracle states.
# ---------------------------------------------------------------------------

_PT = st.tuples(
    st.integers(min_value=1, max_value=8),  # size (small domain → many ties)
    st.integers(min_value=0, max_value=20),  # price (ties likely)
)


def _skyline_bruteforce(points: list[tuple[int, int]]) -> set[tuple[int, int]]:
    pts = set(points)
    out = set()
    for s, p in pts:
        dominated = any(
            s2 >= s and p2 <= p and (s2 > s or p2 < p) for (s2, p2) in pts
        )
        if not dominated:
            out.add((s, p))
    return out


def _skyline_windowed(points: list[tuple[int, int]]) -> set[tuple[int, int]]:
    best: dict[int, int] = {}
    for s, p in points:
        best[s] = min(p, best.get(s, p))
    out = set()
    run_min: int | None = None  # min best price over strictly larger sizes
    for s in sorted(best, reverse=True):
        if run_min is None or run_min > best[s]:
            out.add((s, best[s]))
        run_min = best[s] if run_min is None else min(run_min, best[s])
    return out


@settings(max_examples=500, deadline=None)
@given(st.lists(_PT, min_size=1, max_size=40))
def test_skyline_window_formulation_equals_dominance(points):
    assert _skyline_windowed(points) == _skyline_bruteforce(points)


# ---------------------------------------------------------------------------
# ts_rolling_zscore: the cleared-denominator integer inequality
# (n·v − S)² > k²·(n·Q − S²) must be EXACTLY |v − mean| > k·σ (population),
# proven in exact rational arithmetic including the boundary cases where a
# float formulation would waver.
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(min_value=-32753, max_value=32753), min_size=1, max_size=8),
    st.integers(min_value=-32753, max_value=32753),
)
def test_zscore_cleared_inequality_is_exact(baseline, v):
    n = len(baseline)
    s = sum(baseline)
    q = sum(x * x for x in baseline)
    integer_alert = (n * v - s) ** 2 > 4 * (n * q - s * s)
    mean = Fraction(s, n)
    var = Fraction(q, n) - mean * mean
    rational_alert = (Fraction(v) - mean) ** 2 > 4 * var
    assert integer_alert == rational_alert


# ---------------------------------------------------------------------------
# rel_benford_check constants: the 1e-5 Benford masses must total EXACTLY
# 100000 (they are shares of a complete partition of first digits).
# ---------------------------------------------------------------------------


def test_benford_constants_partition_exactly():
    assert sorted(_BENFORD_E5) == list(range(1, 10))
    assert sum(_BENFORD_E5.values()) == 100000
    assert list(_BENFORD_E5.values()) == sorted(_BENFORD_E5.values(), reverse=True)


# ---------------------------------------------------------------------------
# pipe_dp_noise thresholds: strictly monotone inverse CDF over [-B, B],
# exact top at 2^48, and the two-sided geometric's symmetry — the mass of
# +k equals the mass of −k (within 1 ulp of the 2^48 integer grid).
# ---------------------------------------------------------------------------


def test_dp_noise_thresholds_monotone_symmetric():
    assert len(_DP_T) == 2 * _DP_B + 1
    assert all(a < b for a, b in zip(_DP_T, _DP_T[1:]))
    assert _DP_T[-1] == 2**48
    masses = [t - p for p, t in zip([0] + _DP_T[:-1], _DP_T)]
    for k in range(1, _DP_B + 1):
        lo, hi = masses[_DP_B - k], masses[_DP_B + k]
        assert abs(lo - hi) <= 1, (k, lo, hi)
    # mode at zero: the mechanism must prefer small noise
    assert masses[_DP_B] == max(masses)


def test_dp_noise_released_counts_clamped_and_bounded(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
        pipe_dp_noise,
    )

    rows = pipe_dp_noise(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -_DP_B <= r.noise <= _DP_B
        assert r.released_n == max(r.true_n + r.noise, 0)
        assert r.released_n >= 0


# ---------------------------------------------------------------------------
# rel_mann_whitney: the doubled-midrank rollup formula (2·c_lt + t + 1 per
# distinct value) must produce the exact textbook U computed from average
# ranks in exact rationals.
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=30),
)
def test_mann_whitney_doubled_midranks_exact(xs, ys):
    pooled = sorted(xs + ys)
    # textbook: average rank of each value in the pooled sample
    def avg_rank(v):
        lo = pooled.index(v) + 1
        hi = len(pooled) - pooled[::-1].index(v)
        return Fraction(lo + hi, 2)

    r1 = sum(avg_rank(v) for v in xs)
    n1, n2 = len(xs), len(ys)
    u1_textbook = r1 - Fraction(n1 * (n1 + 1), 2)

    # operator formula: per distinct v, rank2 = 2·c_lt + t + 1
    from collections import Counter

    cnt_all = Counter(xs + ys)
    cnt_x = Counter(xs)
    c_lt, r1_x2 = 0, 0
    for v in sorted(cnt_all):
        t = cnt_all[v]
        r1_x2 += cnt_x.get(v, 0) * (2 * c_lt + t + 1)
        c_lt += t
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    assert Fraction(u1_x2, 2) == u1_textbook
    # U1 + U2 == n1·n2 identity on the doubled scale
    assert u1_x2 + (2 * n1 * n2 - u1_x2) == 2 * n1 * n2


# ---------------------------------------------------------------------------
# rel_gini_spend: the rank-sum formula at 1e-6 fixed point must equal the
# mean-absolute-difference definition G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) in exact
# rationals (up to the final floor).
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=25))
def test_gini_rank_formula_matches_mad_definition(xs):
    n, tot = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(sorted(xs)))
    gini_e6 = (2 * srx - (n + 1) * tot) * 10**6 // (n * tot)
    mad = sum(abs(a - b) for a in xs for b in xs)  # includes both orders
    gini_exact = Fraction(mad, 2 * n * n) / Fraction(tot, n)
    assert gini_e6 == gini_exact * 10**6 - (gini_exact * 10**6) % 1
    assert 0 <= gini_e6 < 10**6


# ---------------------------------------------------------------------------
# graph_clustering_coeff: the one-row report's fields must be internally
# consistent (transitivity recomputable from its own numerator/denominator,
# coefficients inside [0, 1e6]) on real data.
# ---------------------------------------------------------------------------


def test_clustering_coeff_report_internally_consistent(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.graph import (
        graph_clustering_coeff,
    )

    row = graph_clustering_coeff(spark, SF_SMALL).collect()[0]
    assert row.n_nodes > 0 and row.n_wedges > 0
    assert 0 <= row.n_closed <= 3 * row.n_wedges  # each wedge closes ≤ once per role
    assert row.transitivity_e6 == row.n_closed * 10**6 // row.n_wedges
    assert 0 <= row.transitivity_e6 <= 10**6
    assert 0 <= row.mean_local_e6 <= 10**6


# ---------------------------------------------------------------------------
# ts_trend_ols: the five-sum integer-rational fit must equal the textbook
# least-squares solution in exact rationals (truncated toward zero at 1e-6,
# matching Spark DIV / DuckDB HUGEINT //).
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=-10**6, max_value=10**6),
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda p: p[0],
    ).filter(lambda pts: len({x for x, _ in pts}) >= 2)
)
def test_ols_integer_form_matches_textbook(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope_e6 = int(Fraction(num * 10**6, den))
    intercept_e6 = int(Fraction((sy * den - num * sx) * 10**6, n * den))

    beta = Fraction(num, den)
    alpha = Fraction(sy, n) - beta * Fraction(sx, n)
    assert slope_e6 == int(beta * 10**6)
    assert intercept_e6 == int(alpha * 10**6)
    yvar = n * syy - sy * sy
    if yvar:
        r2_e6 = int(Fraction(num * num * 10**6, den * yvar))
        # textbook R² = β²·Sxx/Syy on the centered sums
        r2 = beta * beta * Fraction(den, yvar)
        assert r2_e6 == int(r2 * 10**6)
        assert 0 <= r2_e6 <= 10**6


# ---------------------------------------------------------------------------
# ts_runs_test: the cleared z² = A²(N−1)/(2n1n2(2n1n2−N)) with
# A = R·N − 2n1n2 − N must equal the textbook (R−μ)²/σ² in exact rationals.
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(st.lists(st.booleans(), min_size=3, max_size=50))
def test_runs_test_cleared_z2_is_exact(seq):
    n1, n2 = sum(seq), len(seq) - sum(seq)
    if n1 == 0 or n2 == 0:
        return
    n = n1 + n2
    r = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    a = r * n - 2 * n1 * n2 - n
    var2 = 2 * n1 * n2 * (2 * n1 * n2 - n)
    if var2 <= 0:
        return
    z2_e6 = a * a * (n - 1) * 10**6 // var2
    mu = Fraction(2 * n1 * n2, n) + 1
    var = Fraction(2 * n1 * n2 * (2 * n1 * n2 - n), n * n * (n - 1))
    z2 = (Fraction(r) - mu) ** 2 / var
    assert z2_e6 == z2 * 10**6 - (z2 * 10**6) % 1  # floor (z2 >= 0)


# ---------------------------------------------------------------------------
# embed_hubness_report: the k-occurrence histogram must conserve mass — the
# universe size and the total in-degree (= TOP_K per query) are invariants.
# ---------------------------------------------------------------------------


def test_hubness_histogram_conserves_mass(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.similarity import (
        HUB_CAP,
        TOP_K,
        embed_hubness_report,
    )

    rows = embed_hubness_report(spark, SF_SMALL).collect()
    n_universe = sum(r.n_vectors for r in rows)
    total_indeg = sum(r.in_degree * r.n_vectors for r in rows)
    assert n_universe <= HUB_CAP  # sf0.001 may have fewer vectors than the cap
    assert total_indeg == n_universe * TOP_K


# ---------------------------------------------------------------------------
# pipe_bloom_decontaminate: the structural Bloom guarantee — NO false
# negatives, flagged ⊇ exact — must hold on real data, and the counts must
# be internally consistent.
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_no_false_negatives(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
        pipe_bloom_decontaminate,
    )

    row = pipe_bloom_decontaminate(spark, SF_SMALL).collect()[0]
    assert row.no_false_negatives is True
    assert row.n_bloom_flagged == row.n_exact_contaminated + row.n_false_positives
    assert 0 <= row.n_exact_contaminated <= row.n_bloom_flagged <= row.n_train_docs


# ---------------------------------------------------------------------------
# pipe_temperature_mix: the float-sqrt-plus-clamp integer sqrt must equal
# math.isqrt exactly for any count up to 2^52, and the mixing identities
# must hold (Σ w_bps ≤ 10000 by truncation; factor > 1e6 iff the stratum is
# below its temperature-adjusted target).
# ---------------------------------------------------------------------------


@settings(max_examples=1000, deadline=None)
@given(st.integers(min_value=0, max_value=2**52))
def test_isqrt_clamp_matches_math_isqrt(n):
    import math

    s0 = int(math.floor(math.sqrt(float(n))))
    if (s0 + 1) * (s0 + 1) <= n:
        s = s0 + 1
    elif s0 * s0 > n:
        s = s0 - 1
    else:
        s = s0
    assert s == math.isqrt(n)


def test_temperature_mix_identities(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
        pipe_temperature_mix,
    )

    rows = pipe_temperature_mix(spark, SF_SMALL).collect()
    assert rows
    import math

    ssum = sum(math.isqrt(r.n_docs) for r in rows)
    total = sum(r.n_docs for r in rows)
    for r in rows:
        assert r.sqrt_n == math.isqrt(r.n_docs)
        assert r.w_bps == math.isqrt(r.n_docs) * 10000 // ssum
        assert r.factor_e6 == math.isqrt(r.n_docs) * total * 10**6 // (ssum * r.n_docs)
    assert sum(r.w_bps for r in rows) <= 10000


# ---------------------------------------------------------------------------
# rel_bom_explosion: the recursive running product must equal the directly
# computed Π q(a) over the ancestor path, per part, on real data.
# ---------------------------------------------------------------------------


def test_bom_effective_qty_equals_path_product(spark):
    from ad_hoc_olap_query_processing_engine_spark.operators.olap_subqueries import (
        rel_bom_explosion,
    )

    rows = {r.depth: r for r in rel_bom_explosion(spark, SF_SMALL).collect()}
    assert rows

    def path_product(p):
        eff, node = 1, p
        while node > 1:
            eff *= node % 3 + 1
            node //= 2
        return eff

    import duckdb

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT p_partkey FROM '{SF_SMALL}/part.parquet'"
        ).fetchall()
    ]
    from collections import defaultdict

    by_depth = defaultdict(list)
    for p in keys:
        if p >= 1:  # key 0 is outside the synthetic tree by the operator's contract
            by_depth[p.bit_length() - 1].append(path_product(p))
    assert set(by_depth) == set(rows)
    for d, effs in by_depth.items():
        assert rows[d].n_parts == len(effs)
        assert rows[d].max_eff_qty == max(effs)
        assert rows[d].mean_eff_qty == sum(effs) // len(effs)


# ---------------------------------------------------------------------------
# ts_burstiness: the cleared rational (N·Q − S²)/(N·S) must equal the
# textbook VAR/MEAN over the padded day grid in exact rationals, and the
# crossJoin scalar needs the BNLJ-lint note (1-row broadcast, pareto shape).
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
)
def test_burstiness_cleared_rational_is_exact(extra_zero_days, counts):
    n = len(counts) + extra_zero_days  # grid includes zero-count days
    s = sum(counts)
    q = sum(c * c for c in counts)
    d_e6 = (n * q - s * s) * 10**6 // (n * s)
    grid = counts + [0] * extra_zero_days
    mean = Fraction(s, n)
    var = Fraction(sum((Fraction(c) - mean) ** 2 for c in grid), n)
    d = var / mean
    assert d_e6 == d * 10**6 - (d * 10**6) % 1  # floor; D >= 0 always


# ---------------------------------------------------------------------------
# rel_hhi_concentration: the single-rational HHI must equal the exact
# Σ share² in rationals (up to the final floor), and sit in (1/n, 1].
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**11), min_size=1, max_size=30))
def test_hhi_single_rational_matches_sum_of_squared_shares(revs):
    tot = sum(revs)
    hhi_e8 = sum(r * r for r in revs) * 10**8 // (tot * tot)
    hhi = sum(Fraction(r, tot) ** 2 for r in revs)
    assert hhi_e8 == hhi * 10**8 - (hhi * 10**8) % 1
    assert Fraction(1, len(revs)) <= hhi <= 1


# ---------------------------------------------------------------------------
# pipe_dataset_checksum: the per-language fingerprints must FOLD to the
# corpus total (XOR is associative/commutative; counts add) — the property
# that makes the certificate mergeable across shards.
# ---------------------------------------------------------------------------


def test_dataset_checksum_scopes_fold_to_total(spark):
    from functools import reduce

    from ad_hoc_olap_query_processing_engine_spark.operators.pipeline import (
        pipe_dataset_checksum,
    )

    rows = pipe_dataset_checksum(spark, SF_SMALL).collect()
    total = [r for r in rows if r.scope == "__total__"]
    parts = [r for r in rows if r.scope != "__total__"]
    assert len(total) == 1 and parts
    t = total[0]
    assert sum(p.n_rows for p in parts) == t.n_rows
    assert reduce(lambda a, b: a ^ b, (p.xor48_a for p in parts)) == t.xor48_a
    assert reduce(lambda a, b: a ^ b, (p.xor48_b for p in parts)) == t.xor48_b
