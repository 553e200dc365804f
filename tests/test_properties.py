"""Property-based tests the reference lacks (SURVEY.md §4 implications):
randomized structural invariants of the affinity build and solver output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.solvers.msrc import find_dense_clique, round_solution


@pytest.mark.parametrize("seed", range(4))
def test_affinity_structural_properties(seed):
    rng = np.random.default_rng(seed)
    n1, n2, m = 40, 35, 60
    D1 = rng.uniform(size=(n1, 3))
    D2 = rng.uniform(size=(n2, 3))
    A = np.stack([rng.integers(0, n1, m), rng.integers(0, n2, m)], 1)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.05,
                                                          epsilon=0.2))
    M, C, _ = ct.build_affinity(inv, D1, D2, A)
    M, C = np.asarray(M), np.asarray(C)

    # symmetric, zero diagonal, scores in [0, 1]
    np.testing.assert_array_equal(M, M.T)
    np.testing.assert_array_equal(C, C.T)
    assert (np.diag(M) == 0).all() and (np.diag(C) == 0).all()
    assert (M >= 0).all() and (M <= 1).all()
    assert set(np.unique(C)) <= {0.0, 1.0}
    # C is exactly the pattern of M
    np.testing.assert_array_equal(C, (M > 0).astype(M.dtype))
    # distinctness: shared-endpoint pairs have no edge
    for i in range(m):
        for j in range(m):
            if i != j and (A[i, 0] == A[j, 0] or A[i, 1] == A[j, 1]):
                assert M[i, j] == 0 and C[i, j] == 0


@pytest.mark.parametrize("seed", range(3))
def test_solution_is_feasible_subgraph(seed):
    """The rounded NONZERO support must satisfy all active constraints
    (u_i > 0 and u_j > 0 => C_ij = 1): the homotopy guarantees a feasible
    dense cluster at convergence."""
    rng = np.random.default_rng(100 + seed)
    m = 40
    W = np.triu(rng.uniform(size=(m, m)) * (rng.uniform(size=(m, m)) < 0.35),
                1)
    M = W + W.T
    C = (M > 0).astype(float)
    u0 = rng.uniform(size=m)
    u, F, i = find_dense_clique(jnp.asarray(M), jnp.asarray(C),
                                jnp.asarray(u0), ct.Params())
    u = np.asarray(u)
    sup = np.flatnonzero(u > 1e-9)
    for a in sup:
        for b in sup:
            if a != b:
                assert C[a, b] == 1, (seed, a, b)
    # objective is consistent: F ~= u' (M + I) u at convergence
    F_check = u @ (M @ u) + u @ u
    assert abs(float(F) - F_check) < 1e-5 * max(1.0, abs(F_check))


def test_score_in_unit_interval_pointnormal():
    rng = np.random.default_rng(7)
    n = 30
    pts = rng.normal(size=(n, 3))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    D = np.concatenate([pts, nrm], 1)
    A = np.stack([np.arange(n), np.arange(n)], 1)
    M, C, _ = ct.build_affinity(ct.PointNormalDistance(), D, D, A)
    M = np.asarray(M)
    assert (M >= 0).all() and (M <= 1.0 + 1e-12).all()
    assert not np.isnan(M).any()
