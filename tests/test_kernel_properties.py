"""Property tests (no Spark) for the numeric kernels/identities two
timeseries operators rely on:

- ts_lttb's vectorized LTTB fold vs a naive sequential reference, over
  adversarial series (duplicate timestamps, duplicate/constant values,
  lengths straddling the B cutoff) — the argmax tie-break and bucket
  edges are where a vectorized rewrite silently diverges;
- ts_clamped_balance's closed form bal = S − min(0, running-min S) (and
  clamp ⇔ strict new below-zero prefix minimum) vs the literal
  sequential floor-at-zero fold the DuckDB oracle replays.  The operator
  compiles the closed form to JVM window functions; THIS test is the
  proof the closed form equals the fold (with a cap as well as a floor
  it would not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ad_hoc_olap_query_processing_engine_spark.operators.timeseries import (
    LTTB_B,
    _lttb_fold,
)

from .test_pipeline_ops import _lttb_reference

# series points: small ts range forces duplicate timestamps; values are
# drawn coarse so quantized-y ties happen often
_POINT = st.tuples(
    st.integers(min_value=0, max_value=50) .map(lambda s: 1_700_000_000_000_000 + s * 37_000_000),
    st.integers(min_value=0, max_value=10_000),  # event_id
    st.floats(min_value=0.0, max_value=5.0, allow_nan=False, width=32).map(
        lambda v: round(v, 1)
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_POINT, min_size=2, max_size=80, unique_by=lambda p: (p[0], p[1])))
def test_lttb_kernel_matches_sequential_reference(points):
    ts_us = [p[0] for p in points]
    event_id = [p[1] for p in points]
    value = [p[2] for p in points]
    pdf = pd.DataFrame(
        {
            "user_id": np.int64(7),
            "ts_us": np.array(ts_us, dtype=np.int64),
            "event_id": np.array(event_id, dtype=np.int64),
            "y": np.floor(np.array(value) * 100).astype(np.int64),
        }
    )
    got = _lttb_fold(pdf, LTTB_B)
    ref = _lttb_reference(ts_us, event_id, value, LTTB_B)
    got_rows = [
        (int(r.pos), int(r.rn), int(r.x_off), int(r.y_e2))
        for r in got.itertuples(index=False)
    ]
    assert got_rows == ref


def _clamped_fold(deltas):
    bal, clamps = 0, 0
    for d in deltas:
        nxt = bal + d
        if nxt < 0:
            bal, clamps = 0, clamps + 1
        else:
            bal = nxt
    return bal, clamps


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=200))
def test_clamped_balance_closed_form_equals_fold(deltas):
    d = np.array(deltas, dtype=np.int64)
    s = np.cumsum(d)
    m = np.minimum.accumulate(s)
    prior = np.concatenate(([np.int64(0)], np.minimum(m, 0)[:-1]))
    bal = int(s[-1] - min(0, int(m[-1])))
    clamps = int(np.sum(s < prior))
    assert (bal, clamps) == _clamped_fold(deltas)


# ---------------------------------------------------------------------------
# ts_ewma: the 8-LAG unrolled window (the formulation BOTH the Spark plan and
# the DuckDB oracle now compile to — timeseries.py ts_ewma/_ewma_sql) must
# equal the sequential per-element definition: a truncated-tap EWMA with
# power-of-two weights 128..1 over the last min(8, i+1) observations, final
# smoothing by TRUNCATING integer division (Spark DIV ≡ DuckDB // at any
# sign).  Since round 8 Spark and the oracle share the unrolling, THIS test
# is the independent spec check; negative xq values are in-scope on purpose.
# ---------------------------------------------------------------------------


def _ewma_reference(xq: list[int], taps: int = 8) -> list[int]:
    out = []
    for i in range(len(xq)):
        num = 0
        den = 0
        for j in range(min(taps, i + 1)):
            w = 1 << (taps - 1 - j)
            num += xq[i - j] * w
            den += w
        q = abs(num) // den
        out.append(q if num >= 0 else -q)  # truncate toward zero
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**7), max_value=10**7), min_size=1, max_size=60
    )
)
def test_ewma_lag_unrolling_matches_sequential_reference(xq):
    import duckdb

    from ad_hoc_olap_query_processing_engine_spark.operators.timeseries import (
        _ewma_sql,
    )

    sql = _ewma_sql().replace(
        "WITH q AS (\n  SELECT user_id, event_id, ts,\n"
        "         CAST(FLOOR(value * 10000.0) AS BIGINT) AS xq\n  FROM events)",
        "WITH q AS (SELECT * FROM series)",
    )
    assert "FROM events" not in sql, "oracle CTE shape changed; update splice"
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE series AS SELECT "
        "7::BIGINT AS user_id, "
        "UNNEST(RANGE(1, %d))::BIGINT AS event_id, "
        "make_timestamp(UNNEST(RANGE(1, %d)) * 1000000) AS ts, "
        "UNNEST($vals)::BIGINT AS xq" % (len(xq) + 1, len(xq) + 1),
        params={"vals": xq},
    )
    got = [r[2] for r in sorted(con.sql(sql).fetchall(), key=lambda r: r[1])]
    assert got == _ewma_reference(xq), (xq, got)


# ---------------------------------------------------------------------------
# func_percentile_cont: the integer-rational interpolation
# (v1·den + r·(v2−v1))·10⁴ DIV den must equal textbook PERCENTILE_CONT
# (pos = 1 + p·(n−1), linear interpolation) — checked against numpy's
# 'linear' percentile on the quantized values, exact to the 1e-6 grid's
# truncation (result is within one ulp-of-grid below the real value).
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=50),
    st.sampled_from([(1, 4), (1, 2), (9, 10)]),
)
def test_percentile_cont_integer_form_matches_numpy(vals_e2, p):
    num, den = p
    v = sorted(vals_e2)
    n = len(v)
    k = ((n - 1) * num) // den
    r = ((n - 1) * num) % den
    v1 = v[k]
    v2 = v[k + 1] if r else v1
    got_e6 = (v1 * den + r * (v2 - v1)) * 10000 // den
    exact = np.percentile(np.array(v, dtype=np.float64), 100.0 * num / den,
                          method="linear")
    # got_e6 truncates the exact rational downward on the 1e-6 grid; the
    # tolerance covers numpy's own float64 rounding (the integer form is the
    # exact one — observed numpy error ~1e-12 relative)
    tol = 1e-9 * abs(exact * 10000) + 1e-6
    assert got_e6 <= exact * 10000 + tol
    assert got_e6 > exact * 10000 - 1 - tol, (v, p, got_e6, exact)


# ---------------------------------------------------------------------------
# ts_autocorr: the n²-multiplied integer formulation must equal the textbook
# lag-1 autocorrelation r₁ = Σ_{t>1}(x_t−x̄)(x_{t−1}−x̄) / Σ(x_t−x̄)²
# (full-series mean and variance — the ACF definition, not Pearson-of-
# slices).  The integer form is exact; the float reference carries rounding,
# so compare at bps with a 1-ulp-of-grid tolerance.
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=-(10**5), max_value=10**5), min_size=3, max_size=80)
)
def test_autocorr_integer_form_matches_textbook(x):
    n = len(x)
    s = sum(x)
    sxx = sum(v * v for v in x)
    sxy = sum(x[t] * x[t - 1] for t in range(1, n))
    st_ = sum(x[1:])
    sp = sum(x[:-1])
    num = n * n * sxy - n * s * (st_ + sp) + (n - 1) * s * s
    den = n * n * sxx - n * s * s
    if den == 0:
        return  # constant series: operator emits NULL via NULLIF
    got_bps = abs(num * 10000) // den * (1 if num >= 0 else -1)  # trunc toward 0

    m = s / n
    fnum = sum((x[t] - m) * (x[t - 1] - m) for t in range(1, n))
    fden = sum((v - m) ** 2 for v in x)
    ref = fnum / fden * 10000
    assert abs(got_bps - ref) <= 1 + 1e-6 * abs(ref), (x, got_bps, ref)
