"""Round-10 pins.

The headline item: the closed-form eigh fixture for embed_pca_project
(round-9 verdict #5).  embed_gram_matrix already hash-oracles the
distributed Gram reduction; these tests pin the remaining driver-side
surface (_pca_fit_from_reduced: triangle mirroring, mean/covariance
assembly, numpy eigh, eigenvalue ordering, sign pinning) against a
block-diagonal covariance whose eigendecomposition is known in closed
form — after this every line of the PCA path is verified by something.
"""

from __future__ import annotations

import math

import numpy as np

from ad_hoc_olap_query_processing_engine_spark.operators.similarity import (
    _gram_reduce,
    _pca_fit_from_reduced,
)

DIM = 4
N = 5
# covariance fixture: block-diagonal, all eigenvalues DISTINCT so the
# ordering is unambiguous.  Block [[5,3],[3,5]] has eigenpairs
# (8, (1,1)/sqrt2) and (2, (1,-1)/sqrt2); the diagonal tail adds (2.5, e3)
# and (1, e4).  Sorted desc: 8, 2.5, 2, 1 -> top-2 components are
# (1,1,0,0)/sqrt2 then (0,0,1,0).  Every entry is dyadic, so g = (N-1)*C
# and the n*mu*mu' correction are EXACT in float64 — no tolerance needed
# on the inputs, only ulps on eigh's output.
COV = np.array(
    [
        [5.0, 3.0, 0.0, 0.0],
        [3.0, 5.0, 0.0, 0.0],
        [0.0, 0.0, 2.5, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def _reduced_rows(mu: np.ndarray) -> list[dict]:
    """The (i, j, g, n, s) rows _gram_reduce's merge emits, synthesized so
    the sample covariance equals COV exactly: g = (N-1)*COV + N*mu*mu',
    s = N*mu (all dyadic -> float64-exact)."""
    g = (N - 1) * COV + N * np.outer(mu, mu)
    rows: list[dict] = []
    for d in range(DIM):
        rows.append({"i": d, "j": -1, "g": 0.0, "n": N, "s": N * mu[d]})
    for i in range(DIM):
        for j in range(i, DIM):  # upper triangle only, like the groupBy output
            rows.append({"i": i, "j": j, "g": g[i, j], "n": 0, "s": 0.0})
    return rows


def _check_closed_form(mu_vec: np.ndarray) -> None:
    mu, comps = _pca_fit_from_reduced(_reduced_rows(mu_vec), DIM, n_pc=2)
    assert mu == list(mu_vec)  # dyadic means reconstruct exactly
    comps = np.array(comps)
    r = 1.0 / math.sqrt(2.0)
    expected = np.array([[r, r, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    # eigh is exact up to ulps; 1e-12 is ~1e4 ulps of headroom at this scale
    assert np.abs(comps - expected).max() < 1e-12, comps
    # invariants that hold regardless of the fixture: orthonormal rows,
    # eigen-equation with the KNOWN eigenvalues, pinned sign
    assert np.abs(comps @ comps.T - np.eye(2)).max() < 1e-12
    for k, lam in enumerate((8.0, 2.5)):
        assert np.abs(COV @ comps[k] - lam * comps[k]).max() < 1e-12
        assert comps[k, np.argmax(np.abs(comps[k]))] > 0


def test_pca_fit_closed_form():
    _check_closed_form(np.zeros(DIM))


def test_pca_fit_closed_form_nonzero_mean():
    # exercises the n*mu*mu' centering correction: same covariance, shifted
    # data — components must be identical
    _check_closed_form(np.array([1.0, 2.0, -3.0, 4.0]))


def test_gram_reduce_exact_on_integers(spark):
    """Full-path check of the distributed reduction feeding the fit: the
    round-11 kernel quantizes q = floor(x·QUANT_SCALE) and reduces in int64,
    so the assembled Gram/count/sums must equal numpy's Q'Q exactly."""
    from ad_hoc_olap_query_processing_engine_spark.operators.similarity import (
        QUANT_SCALE,
    )

    rng = np.random.RandomState(7)
    x = rng.randint(-5, 6, size=(23, DIM)).astype("float64")
    df = spark.createDataFrame(
        [([float(v) for v in row],) for row in x], "embedding array<double>"
    ).repartition(4)  # multiple Arrow batches -> the merge groupBy is real
    red = {(r["i"], r["j"]): r for r in _gram_reduce(df, DIM).collect()}
    q = np.floor(x * QUANT_SCALE).astype("int64")
    expected = q.T @ q
    for i in range(DIM):
        for j in range(i, DIM):
            assert red[(i, j)]["g"] == expected[i, j]
        assert red[(i, -1)]["s"] == q[:, i].sum()
    assert red[(0, -1)]["n"] == len(x)
    # and the fit over the real reduction matches a direct numpy PCA: the
    # q-space mean scales by QUANT_SCALE; eigenvectors are scale-invariant
    # (cov_q = QUANT_SCALE²·cov_x), so they satisfy cov_x's eigen-equation
    mu, comps = _pca_fit_from_reduced(red.values(), DIM, n_pc=2)
    assert np.abs(np.array(mu) / QUANT_SCALE - x.mean(axis=0)).max() < 1e-12
    cov = np.cov(x, rowvar=False)
    got = np.array(comps)
    for k in range(2):
        # eigen-equation residual: got[k] must be an eigenvector of cov
        lam = got[k] @ cov @ got[k]
        assert np.abs(cov @ got[k] - lam * got[k]).max() < 1e-9


def test_connected_components_random_graphs_vs_networkless_oracle(spark):
    """Frontier-shrink + double-jump CC (round-10) must equal a plain
    union-find ground truth on adversarial random graphs: long paths (worst
    case for label propagation), stars, cliques, and disconnected mixes."""
    import random

    from ad_hoc_olap_query_processing_engine_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(42)

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-label per component
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(m) for m in comp.values() for n in m}

    for trial in range(4):
        edges = set()
        # long path (ids shuffled so min is mid-path), a clique, a star,
        # plus random noise edges
        path = rng.sample(range(1000, 1100), 60)
        edges.update(zip(path, path[1:]))
        clique = rng.sample(range(2000, 2050), 8)
        edges.update((a, b) for a in clique for b in clique if a < b)
        hub = 3000 + trial
        edges.update((hub, 3100 + i) for i in range(10))
        for _ in range(30):
            a, b = rng.randrange(4000, 4200), rng.randrange(4000, 4200)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        nodes = {a for a, _ in edges} | {b for _, b in edges}
        exp = uf_components(edges, nodes)
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()
        }
        assert got == exp, f"trial {trial}: CC mismatch"
