"""Pallas fused affinity-build kernel vs the XLA dense build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.ops.affinity_pallas import build_affinity_pallas


def make_inputs(rng, n=100, m=300, d=3):
    D1 = rng.uniform(size=(n, 3)).astype(np.float32)
    th = 0.5
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    D2 = (D1 @ R.T).astype(np.float32)
    A = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)],
                 1).astype(np.int32)
    return D1, D2, A


def test_euclidean_matches_dense_build():
    rng = np.random.default_rng(0)
    D1, D2, A = make_inputs(rng)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.05,
                                                          epsilon=0.2))
    M_ref, C_ref = ct.score_pairwise_consistency(
        inv, jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A))
    P1 = jnp.asarray(D1)[A[:, 0]]
    P2 = jnp.asarray(D2)[A[:, 1]]
    M, C = build_affinity_pallas(inv, P1, P2, jnp.asarray(A))
    # under jax x64, python-scalar params promote differently in the dense
    # path vs inside the kernel: tiny (~1e-6 rel) fp differences are expected
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), rtol=3e-5,
                               atol=1e-5)
    assert (np.asarray(C) != np.asarray(C_ref)).mean() < 1e-4


def test_pointnormal_matches_dense_build():
    rng = np.random.default_rng(1)
    n, m = 80, 200
    pts = rng.uniform(size=(n, 3))
    nr = rng.normal(size=(n, 3))
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    D1 = np.concatenate([pts, nr], 1).astype(np.float32)
    D2 = np.concatenate([pts @ R.T, nr @ R.T], 1).astype(np.float32)
    A = np.stack([rng.integers(0, n, m), rng.integers(0, n, m)],
                 1).astype(np.int32)
    inv = ct.PointNormalDistance()
    M_ref, C_ref = ct.score_pairwise_consistency(
        inv, jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A))
    M, C = build_affinity_pallas(inv, jnp.asarray(D1)[A[:, 0]],
                                 jnp.asarray(D2)[A[:, 1]], jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), rtol=3e-5,
                               atol=1e-5)
    assert (np.asarray(C) != np.asarray(C_ref)).mean() < 1e-4


def test_exact_tile_multiple():
    rng = np.random.default_rng(2)
    D1, D2, A = make_inputs(rng, m=512)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.05,
                                                          epsilon=0.2))
    M_ref, C_ref = ct.score_pairwise_consistency(
        inv, jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A))
    M, C = build_affinity_pallas(inv, jnp.asarray(D1)[A[:, 0]],
                                 jnp.asarray(D2)[A[:, 1]], jnp.asarray(A))
    assert M.shape == (512, 512)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), rtol=3e-5,
                               atol=1e-5)
