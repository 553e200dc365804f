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


def test_stored_pallas_matches_xla_exactly():
    """Fused direct-to-storage kernel is bit-identical to the XLA build
    (int8 and bf16, with and without m_true padding masks)."""
    from clipper_tpu.ops.affinity import score_consistency_stored
    from clipper_tpu.ops.affinity_pallas import (
        score_consistency_stored_pallas)

    rng = np.random.default_rng(0)
    D1, D2, A = make_inputs(rng, m=300)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.05,
                                                          epsilon=0.2))
    D1j, D2j, Aj = jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A)
    for st in (jnp.int8, jnp.bfloat16):
        for mt in (None, 200):
            ref = score_consistency_stored(inv, D1j, D2j, Aj, m_true=mt,
                                           storage_dtype=st)
            got = score_consistency_stored_pallas(
                inv, D1j, D2j, Aj, m_true=mt, storage_dtype=st, tile=128)
            assert got.shape == ref.shape
            if st == jnp.int8:
                # verified bit-identical on real TPU hardware as well
                np.testing.assert_array_equal(
                    np.asarray(got, np.float32), np.asarray(ref, np.float32))
            else:
                # CPU interpret mode under x64: python-scalar params promote
                # differently in-kernel, so knife-edge bf16 roundings can
                # differ by one ulp (same caveat as the dense-kernel tests)
                g = np.asarray(got, np.float32)
                r = np.asarray(ref, np.float32)
                assert (g != r).mean() < 1e-4
                np.testing.assert_allclose(g, r, atol=2e-5, rtol=1e-2)


def test_stored_pallas_pointnormal():
    from clipper_tpu.ops.affinity import score_consistency_stored
    from clipper_tpu.ops.affinity_pallas import (
        score_consistency_stored_pallas)

    rng = np.random.default_rng(1)
    n, m = 80, 200
    pts = rng.uniform(size=(n, 3))
    nr = rng.normal(size=(n, 3))
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    D1 = jnp.asarray(np.concatenate([pts, nr], 1).astype(np.float32))
    D2 = jnp.asarray(
        np.concatenate([pts @ R.T, nr @ R.T], 1).astype(np.float32))
    A = jnp.asarray(np.stack([rng.integers(0, n, m),
                              rng.integers(0, n, m)], 1).astype(np.int32))
    inv = ct.PointNormalDistance()
    ref = score_consistency_stored(inv, D1, D2, A, storage_dtype=jnp.int8)
    got = score_consistency_stored_pallas(inv, D1, D2, A,
                                          storage_dtype=jnp.int8, tile=128)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pool_pipeline_pallas_build_matches_xla():
    """End-to-end pool pipeline with build='pallas' returns identical
    solutions to build='xla' (same quantized storage -> same ticks)."""
    from clipper_tpu.parallel import pool

    rng = np.random.default_rng(3)
    W, n, m = 3, 60, 96
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2s.append(D1 @ R.T + rng.normal(0, 0.002, size=(n, 3)))
        As.append(np.stack([rng.integers(0, n, m),
                            rng.integers(0, n, m)], 1))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As), jnp.int32),
            jnp.asarray(rng.uniform(size=(W, m)).astype(np.float32)))
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    sx = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                 storage_dtype=jnp.int8, build="xla")(*args)
    sp = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                 storage_dtype=jnp.int8,
                                 build="pallas")(*args)
    np.testing.assert_array_equal(np.asarray(sx.mask), np.asarray(sp.mask))
    np.testing.assert_allclose(np.asarray(sx.score), np.asarray(sp.score),
                               rtol=1e-6)
