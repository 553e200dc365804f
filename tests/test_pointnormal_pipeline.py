"""Point-normal (surfel/plane) end-to-end pipeline test — BASELINE config 3:
LiDAR-style scan alignment with the heavier 6-dof invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.bench import data, harness
from clipper_tpu.solvers.msrc import find_dense_clique, round_solution


def test_pointnormal_scan_alignment():
    rng = np.random.default_rng(0)
    D1, D2, A, Agt = harness.make_pointnormal_problem(rng, n=400, m=512,
                                                      rho=0.85, noise=0.005)
    inv = ct.PointNormalDistance(ct.PointNormalDistanceParams(
        sigp=0.03, epsp=0.06, sign=0.05, epsn=0.15))
    M, C, _ = ct.build_affinity(inv, jnp.asarray(D1), jnp.asarray(D2),
                                jnp.asarray(A))
    u0 = jnp.asarray(np.random.default_rng(1).uniform(size=512))
    u, F, _ = find_dense_clique(M, C, u0, ct.Params())
    mask = np.asarray(round_solution(u, F))
    p, r = data.get_precision_recall(A[mask], Agt)
    assert p >= 0.95, p
    assert r >= 0.60, r


def test_pointnormal_rigid_invariance():
    """Scores must be invariant to the rigid transform (perfect data)."""
    rng = np.random.default_rng(2)
    D1, D2, A, Agt = harness.make_pointnormal_problem(rng, n=100, m=100,
                                                      rho=0.0, noise=0.0)
    inv = ct.PointNormalDistance()
    M, C, _ = ct.build_affinity(inv, jnp.asarray(D1), jnp.asarray(D2),
                                jnp.asarray(A))
    m = 100
    iu = np.triu_indices(m, 1)
    # perfect rigid data: every distinct pair fully consistent
    assert (np.asarray(M)[iu] > 0.999).all()
