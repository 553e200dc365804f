"""Symmetric-triangle tile storage (ops/symstore.py): parity vs dense.

The capacity path for single huge problems on one chip: upper-triangle
[M; C] tiles, forward + transposed application. Must reproduce the dense
stacked matvec and the dense pipeline's solution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import clipper_tpu as ct
from clipper_tpu.ops import symstore
from clipper_tpu.ops.affinity import score_pairwise_consistency
from clipper_tpu.solvers import msrc, msrc_flat

INV = ct.EuclideanDistance()


def make_problem(rng, n=128, n_inliers=30, m=96):
    D1 = rng.uniform(-1, 1, size=(n, 3))
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    D2 = D1 @ R.T + rng.normal(scale=0.002, size=(n, 3))
    A = np.stack([rng.permutation(n)[:m], rng.permutation(n)[:m]], axis=1)
    A[:n_inliers, 1] = A[:n_inliers, 0]
    return jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A, jnp.int32)


@pytest.mark.parametrize("storage", [None, jnp.int8])
@pytest.mark.parametrize("K", [1, 4])
def test_sym_matvec_matches_dense(storage, K):
    rng = np.random.default_rng(0)
    D1, D2, A = make_problem(rng, m=96)
    m, t = 96, 32
    nt = m // t
    P1 = D1[A[:, 0]]
    P2 = D2[A[:, 1]]

    M, C = score_pairwise_consistency(INV, D1, D2, A, affinityeps=1e-4)
    sd = storage or M.dtype
    MC = jnp.concatenate([M, C], axis=0)
    if storage is not None and jnp.dtype(storage) == jnp.int8:
        MC = msrc_flat.quantize_stacked(MC)
    mv_dense = msrc_flat.make_stacked_matvec(MC, M.dtype)

    tiles = jax.jit(lambda P1, P2, A: symstore.build_symtiles(
        INV, P1, P2, A, m, tile=t, storage_dtype=sd,
        build_chunk=3))(P1, P2, A)
    assert tiles.shape == (nt * (nt + 1) // 2, 2 * t, t)
    mv_sym = symstore.make_sym_dual_matvec(tiles, nt, M.dtype, mv_chunk=2)

    u = jnp.asarray(rng.uniform(size=(m, K)) if K > 1
                    else rng.uniform(size=m), M.dtype)
    Mu_d, Cu_d = jax.jit(mv_dense)(u)
    Mu_s, Cu_s = jax.jit(mv_sym)(u)
    tol = dict(rtol=2e-5, atol=2e-6) if storage is None else \
        dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Mu_s), np.asarray(Mu_d), **tol)
    np.testing.assert_allclose(np.asarray(Cu_s), np.asarray(Cu_d), **tol)


def test_sym_matvec_int8_bitmatches_dense_int8():
    """int8 tiles hold round(127*x) of the same masked scores as the dense
    int8 storage; the bf16 dequant matmul then sums the same products —
    require exact equality of the two quantized matvec paths on (m,)."""
    rng = np.random.default_rng(1)
    D1, D2, A = make_problem(rng, m=64)
    m, t = 64, 32
    nt = m // t
    P1 = D1[A[:, 0]].astype(jnp.float32)
    P2 = D2[A[:, 1]].astype(jnp.float32)
    D1f, D2f = D1.astype(jnp.float32), D2.astype(jnp.float32)

    M, C = score_pairwise_consistency(INV, D1f, D2f, A, affinityeps=1e-4)
    MCq = msrc_flat.quantize_stacked(jnp.concatenate([M, C], axis=0))
    tiles = jax.jit(lambda P1, P2, A: symstore.build_symtiles(
        INV, P1, P2, A, m, tile=t, storage_dtype=jnp.int8))(P1, P2, A)

    # stored entries agree exactly with the dense quantized matrix
    rows, cols = symstore.tile_coords(nt)
    Mq = np.asarray(MCq[:m])
    Cq = np.asarray(MCq[m:])
    tl = np.asarray(tiles)
    for k, (r, c) in enumerate(zip(rows, cols)):
        blkM = Mq[r * t:(r + 1) * t, c * t:(c + 1) * t]
        blkC = Cq[r * t:(r + 1) * t, c * t:(c + 1) * t]
        np.testing.assert_array_equal(tl[k, :t], blkM, err_msg=f"tile {k}")
        np.testing.assert_array_equal(tl[k, t:], blkC, err_msg=f"tile {k}")


def test_sym_solve_single_matches_dense_pipeline():
    rng = np.random.default_rng(2)
    D1, D2, A = make_problem(rng, n=120, n_inliers=40, m=100)  # pads to 128
    m = 100
    u0 = jnp.asarray(rng.uniform(size=m), jnp.float32)
    D1f, D2f = D1.astype(jnp.float32), D2.astype(jnp.float32)

    u, F, ifinal = symstore.solve_single(
        INV, D1f, D2f, A, u0, ct.Params(), tile=32, storage_dtype=jnp.int8,
        power_steps=4, support=64)
    mask = np.asarray(msrc.round_solution(u, F, ct.Rounding.DSD_HEU))

    # dense reference on the same problem
    M, C = score_pairwise_consistency(INV, D1f, D2f,
                                      jnp.asarray(A, jnp.int32),
                                      affinityeps=1e-4)

    @jax.jit
    def dense(M, C, u0):
        mvd = msrc_flat.stacked_dual_matvec(M, C, jnp.int8)
        u0p = msrc_flat.power_init(mvd, u0, 4)
        u, F, i = msrc_flat.flat_solve_single(mvd, u0p, ct.Params())
        F = msrc_flat.recompute_objective(msrc_flat.stacked_dual_matvec(M, C), u)
        return u, F, i

    u_d, F_d, _ = dense(M, C, u0)
    mask_d = np.asarray(msrc.round_solution(u_d, F_d, ct.Rounding.DSD_HEU))

    a, b = set(np.flatnonzero(mask)), set(np.flatnonzero(mask_d))
    iou = len(a & b) / max(1, len(a | b))
    assert iou >= 0.9, (sorted(a), sorted(b))
    assert abs(float(F) - float(F_d)) / float(F_d) < 0.05


@pytest.mark.parametrize("storage", [None, jnp.int8])
@pytest.mark.parametrize("K", [1, 4])
def test_sym_matvec_pallas_matches_xla(storage, K):
    """The one-read Pallas kernel must agree with the XLA tile matvec
    (interpret mode off-TPU; the real-chip run is benched in BENCH.md)."""
    rng = np.random.default_rng(7)
    D1, D2, A = make_problem(rng, m=96)
    m, t = 96, 32
    nt = m // t
    P1 = D1[A[:, 0]].astype(jnp.float32)
    P2 = D2[A[:, 1]].astype(jnp.float32)
    sd = storage or jnp.float32

    tiles = jax.jit(lambda P1, P2, A: symstore.build_symtiles(
        INV, P1, P2, A, m, tile=t, storage_dtype=sd))(P1, P2, A)
    mv_x = symstore.make_sym_dual_matvec(tiles, nt, jnp.float32, mv_chunk=2)
    mv_p = symstore.make_sym_dual_matvec_pallas(tiles, nt, jnp.float32,
                                                tiles_block=4)

    u = jnp.asarray(rng.uniform(size=(m, K)) if K > 1
                    else rng.uniform(size=m), jnp.float32)
    Mu_x, Cu_x = mv_x(u)
    Mu_p, Cu_p = mv_p(u)
    np.testing.assert_allclose(np.asarray(Mu_p), np.asarray(Mu_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Cu_p), np.asarray(Cu_x),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("storage", [None, jnp.int8])
@pytest.mark.parametrize("K", [1, 4])
def test_sym_matvec_pallas_rows_matches_xla(storage, K):
    """The row-chunked one-read kernel (build_symchunks +
    make_sym_dual_matvec_pallas_rows) must agree with the XLA tile matvec
    (interpret mode off-TPU; real-chip timings in BENCH.md round 4)."""
    rng = np.random.default_rng(11)
    D1, D2, A = make_problem(rng, m=96)
    m, t, G = 96, 32, 2
    nt = m // t
    P1 = D1[A[:, 0]].astype(jnp.float32)
    P2 = D2[A[:, 1]].astype(jnp.float32)
    sd = storage or jnp.float32

    tiles = jax.jit(lambda P1, P2, A: symstore.build_symtiles(
        INV, P1, P2, A, m, tile=t, storage_dtype=sd))(P1, P2, A)
    mv_x = symstore.make_sym_dual_matvec(tiles, nt, jnp.float32, mv_chunk=2)

    chunk_r, chunk_c0, rows, cols = symstore.row_chunk_coords(nt, G)
    chunks = jax.jit(lambda P1, P2, A: symstore.build_symchunks(
        INV, P1, P2, A, m, tile=t, G=G, storage_dtype=sd,
        build_chunk=2))(P1, P2, A)
    assert chunks.shape == (len(chunk_r), 2 * t, G * t)
    # chunk-major storage holds the same tiles as the canonical build
    tl = np.asarray(tiles)
    t_r, t_c = symstore.tile_coords(nt)
    canon = {(int(r), int(c)): tl[k] for k, (r, c) in enumerate(zip(t_r, t_c))}
    ch = np.asarray(chunks)
    for k, (r, c) in enumerate(zip(rows, cols)):
        blk = ch[k // G, :, (k % G) * t:(k % G + 1) * t]
        if int(r) < nt:
            np.testing.assert_array_equal(blk, canon[(int(r), int(c))])
        else:
            assert not blk.any()

    mv_p = symstore.make_sym_dual_matvec_pallas_rows(
        chunks, chunk_r, chunk_c0, nt, jnp.float32)
    u = jnp.asarray(rng.uniform(size=(m, K)) if K > 1
                    else rng.uniform(size=m), jnp.float32)
    Mu_x, Cu_x = mv_x(u)
    Mu_p, Cu_p = mv_p(u)
    np.testing.assert_allclose(np.asarray(Mu_p), np.asarray(Mu_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Cu_p), np.asarray(Cu_x),
                               rtol=2e-5, atol=2e-5)
