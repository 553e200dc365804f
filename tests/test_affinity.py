"""Affinity-build golden tests.

Ports the reference's cross-implementation parity oracle
(reference: test/affinity_test.cpp:14-108): a 4-point model, an SE(3)
transformed 3-point partial view, all-to-all associations, and an exact
12x12 affinity matrix originally computed in MATLAB.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct


def make_scene():
    """4-point model + SE(3)-transformed 3-point partial view (data as (d, n))."""
    model = np.array([[0, 2, 0, 2],
                      [0, 0, 3, 2],
                      [0, 0, 0, 0]], dtype=np.float64)

    th = np.pi / 8
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    t = np.array([5.0, 3.0, 0.0])
    # data = T_MD^{-1} * model
    data = R.T @ (model - t[:, None])
    data = data[:, :3]  # partial view
    return model, data


# Expected affinity matrix, from MATLAB (reference: test/affinity_test.cpp:95-106)
MTRUE = np.array([
    [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0],
    [0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0],
    [0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0],
    [1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0],
    [0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0],
    [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0],
    [0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0],
    [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
], dtype=np.float64)


def test_all_to_all_layout():
    A = np.asarray(ct.create_all_to_all(4, 3))
    assert A.shape == (12, 2)
    for i in range(4):
        for j in range(3):
            k = i * 3 + j
            assert A[k, 0] == i
            assert A[k, 1] == j


def test_euclidean_affinity_golden():
    model, data = make_scene()
    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)

    A = clipper.get_initial_associations()
    assert A.shape == (12, 2)

    M = np.asarray(clipper.get_affinity_matrix())
    C = np.asarray(clipper.get_constraint_matrix())

    # diagonal all ones; symmetric; binary perfect-data case M == C
    np.testing.assert_array_equal(np.diag(M), np.ones(12))
    np.testing.assert_array_equal(M, M.T)
    np.testing.assert_array_equal(C, C.T)
    np.testing.assert_array_equal(M, C)

    # exact equality with the MATLAB-derived golden matrix
    np.testing.assert_array_equal(M, MTRUE)


def test_distinctness_mask():
    A = jnp.array([[0, 0], [0, 1], [1, 0], [2, 2]], dtype=jnp.int32)
    mask = np.asarray(ct.ops.distinctness_mask(A))
    # (0,0) vs (0,1): share first endpoint -> masked
    assert not mask[0, 1]
    # (0,0) vs (1,0): share second endpoint -> masked
    assert not mask[0, 2]
    # (0,1) vs (1,0): distinct
    assert mask[1, 2]
    # (0,0) vs (2,2): distinct
    assert mask[0, 3]
    assert not mask.diagonal().any()


def test_affinity_threshold():
    # scores at or below affinityeps must be dropped (strict inequality,
    # reference: src/clipper.cpp:53)
    D1 = np.array([[0.0, 1.0], [0.0, 0.0], [0.0, 0.0]])
    # second point perturbed so the invariant score is tiny but nonzero
    eps_pt = 0.0565  # |l1 - l2| = 0.0565 < epsilon=0.06, score ~ 1.2e-7
    D2 = np.array([[0.0, 1.0 + eps_pt], [0.0, 0.0], [0.0, 0.0]])
    A = np.array([[0, 0], [1, 1]])
    inv = ct.EuclideanDistance()
    c = 0.0565
    expected = np.exp(-0.5 * c * c / (0.01 ** 2))
    assert expected < 1e-4  # below default affinityeps

    clipper = ct.Clipper(inv, ct.Params())
    clipper.score_pairwise_consistency(D1, D2, A)
    M = np.asarray(clipper.get_affinity_matrix())
    assert M[0, 1] == 0.0


def test_pointnormal_affinity_matches_pairwise():
    rng = np.random.default_rng(0)
    n = 20
    pts1 = rng.normal(size=(n, 3))
    nrm1 = rng.normal(size=(n, 3))
    nrm1 /= np.linalg.norm(nrm1, axis=1, keepdims=True)
    D1 = np.concatenate([pts1, nrm1], axis=1)
    # D2: rotated copy
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    D2 = np.concatenate([pts1 @ R.T, nrm1 @ R.T], axis=1)

    inv = ct.PointNormalDistance()
    A = np.stack([np.arange(n), np.arange(n)], axis=1)
    M, C, _ = ct.build_affinity(inv, D1, D2, A)
    M = np.asarray(M)

    # elementwise path must agree with the Gram-matrix fast path
    P1, P2 = D1[A[:, 0]], D2[A[:, 1]]
    ref = np.asarray(inv(P1[:, None, :], P1[None, :, :],
                         P2[:, None, :], P2[None, :, :]))
    iu = np.triu_indices(n, 1)
    np.testing.assert_allclose(M[iu], np.where(ref > 1e-4, ref, 0.0)[iu],
                               atol=1e-12)
    # perfect rigid transform: all distinct pairs perfectly consistent
    assert (M[iu] > 0.99).all()


def test_stored_build_bit_parity():
    """score_consistency_stored == quantize(concat(score_pairwise_consistency))
    bitwise, for int8 and bf16, symmetric and asymmetric invariants, with and
    without m_true padding."""
    from clipper_tpu.ops.affinity import (score_consistency_stored,
                                          score_pairwise_consistency)
    from clipper_tpu.solvers import msrc_flat

    rng = np.random.default_rng(3)
    n = 40
    m = 48
    D1 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    D2 = jnp.asarray(rng.normal(size=(n, 3)) * 0.9, jnp.float32)
    A = jnp.asarray(rng.integers(0, n, size=(m, 2)), jnp.int32)

    class Asym:
        """Deliberately exchange-asymmetric custom invariant."""
        symmetric = False

        def score_matrix(self, P1, P2):
            d1 = jnp.sum((P1[:, None, :] - P1[None, :, :]) ** 2, -1)
            d2 = jnp.sum((P2[:, None, :] - P2[None, :, :]) ** 2, -1)
            return jnp.exp(-jnp.abs(d1 - 0.99 * d2))

    from clipper_tpu.invariants.euclidean import EuclideanDistanceParams
    eucl = ct.EuclideanDistance(EuclideanDistanceParams(sigma=0.3,
                                                        epsilon=1.0))
    for inv in (eucl, Asym()):
        for m_true in (None, 31):
            M, C = score_pairwise_consistency(inv, D1, D2, A,
                                              affinityeps=1e-4, m_true=m_true)
            MC = jnp.concatenate([M, C], axis=0)
            ref_i8 = msrc_flat.quantize_stacked(MC)
            got_i8 = score_consistency_stored(inv, D1, D2, A,
                                              affinityeps=1e-4, m_true=m_true,
                                              storage_dtype=jnp.int8)
            np.testing.assert_array_equal(np.asarray(ref_i8),
                                          np.asarray(got_i8))
            got_bf = score_consistency_stored(inv, D1, D2, A,
                                              affinityeps=1e-4, m_true=m_true,
                                              storage_dtype=jnp.bfloat16)
            np.testing.assert_array_equal(
                np.asarray(MC.astype(jnp.bfloat16), np.float32),
                np.asarray(got_bf, np.float32))
