"""Block-sparse (occupied-tile) storage: matvec parity, fallback, solve.

The block-sparse dual matvec must reproduce the dense stacked matvec
exactly up to f32 summation order, fall back to dense storage at high
occupancy, and solve structured (multi-object) problems to the same mask.
"""

import jax
import jax.numpy as jnp
import numpy as np

import clipper_tpu as ct
from clipper_tpu.ops import blocksparse
from clipper_tpu.solvers import msrc, msrc_flat


def structured_graph(rng, m=256, blocks=4, density=0.5):
    """Block-diagonal consistency graph: `blocks` objects, no cross edges."""
    bm = m // blocks
    M = np.zeros((m, m))
    for b in range(blocks):
        s = slice(b * bm, (b + 1) * bm)
        W = rng.uniform(size=(bm, bm))
        keep = np.triu(rng.uniform(size=(bm, bm)) < density, 1)
        Mu_ = np.where(keep, np.triu((W + W.T) / 2, 1), 0.0)
        M[s, s] = Mu_ + Mu_.T
    C = (M > 0).astype(np.float64)
    return M, C


def test_matvec_matches_dense_f32():
    rng = np.random.default_rng(0)
    M, C = structured_graph(rng, m=256, blocks=4)
    bs, info = blocksparse.from_dense(M, C, tile=32, storage_dtype=None)
    assert bs is not None
    assert info["occupancy"] <= 0.25 + 1e-9  # block-diagonal: 1/blocks
    u = rng.uniform(size=256).astype(np.float32)

    mv = blocksparse.make_matvec(bs, info["nt"], jnp.float32)
    Mu_b, Cu_b = jax.jit(mv)(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(Mu_b), M.astype(np.float32) @ u,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Cu_b), C.astype(np.float32) @ u,
                               rtol=1e-5, atol=1e-5)


def test_matvec_multiprobe_columns():
    rng = np.random.default_rng(1)
    M, C = structured_graph(rng, m=128, blocks=4)
    bs, info = blocksparse.from_dense(M, C, tile=32, storage_dtype=None)
    U = rng.uniform(size=(128, 5)).astype(np.float32)
    mv = blocksparse.make_matvec(bs, info["nt"], jnp.float32)
    MU, CU = jax.jit(mv)(jnp.asarray(U))
    np.testing.assert_allclose(np.asarray(MU), M.astype(np.float32) @ U,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(CU), C.astype(np.float32) @ U,
                               rtol=1e-5, atol=1e-5)


def test_int8_matches_dense_int8_matvec():
    """Quantized tile matvec == quantized dense matvec (same storage)."""
    rng = np.random.default_rng(2)
    M, C = structured_graph(rng, m=128, blocks=4)
    u = rng.uniform(size=128).astype(np.float32)

    bs, info = blocksparse.from_dense(M, C, tile=32, storage_dtype=jnp.int8)
    mv_b = blocksparse.make_matvec(bs, info["nt"], jnp.float32)
    Mu_b, Cu_b = jax.jit(mv_b)(jnp.asarray(u))

    MC = msrc_flat.quantize_stacked(
        jnp.concatenate([jnp.asarray(M, jnp.float32),
                         jnp.asarray(C, jnp.float32)]))
    mv_d = msrc_flat.make_stacked_matvec(MC, jnp.float32)
    Mu_d, Cu_d = jax.jit(mv_d)(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(Mu_b), np.asarray(Mu_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Cu_b), np.asarray(Cu_d),
                               rtol=1e-5, atol=1e-5)


def test_high_occupancy_falls_back_dense():
    rng = np.random.default_rng(3)
    m = 64
    W = rng.uniform(size=(m, m))
    Mu_ = np.triu((W + W.T) / 2, 1)   # fully dense
    M = Mu_ + Mu_.T
    C = (M > 0).astype(np.float64)
    bs, info = blocksparse.from_dense(M, C, tile=16, storage_dtype=jnp.int8)
    assert bs is None
    assert info["occupancy"] == 1.0
    assert info["dense"].shape == (2 * m, m)
    assert info["dense"].dtype == jnp.int8


def test_padding_non_divisible_m():
    rng = np.random.default_rng(4)
    M, C = structured_graph(rng, m=96, blocks=3)   # 96 % 32 == 0, pad vs 64
    bs, info = blocksparse.from_dense(M, C, tile=64, storage_dtype=None)
    assert info["m_pad"] == 128
    u = np.zeros(128, np.float32)
    u[:96] = rng.uniform(size=96)
    mv = blocksparse.make_matvec(bs, info["nt"], jnp.float32)
    Mu_b, Cu_b = jax.jit(mv)(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(Mu_b)[:96],
                               M.astype(np.float32) @ u[:96],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Mu_b)[96:], 0.0)


def test_solve_single_mask_parity():
    """Structured scene: block-sparse solve finds the same clique as dense."""
    rng = np.random.default_rng(5)
    m, blocks = 256, 4
    M, C = structured_graph(rng, m=m, blocks=blocks, density=0.3)
    # plant a clique in object 2
    cl = np.arange(128, 128 + 20)
    M[np.ix_(cl, cl)] = 0.9
    M[cl, cl] = 0.0
    C = (M > 0).astype(np.float64)
    u0 = rng.uniform(size=m).astype(np.float32)
    params = ct.Params()

    u_b, F_b, _, info = blocksparse.solve_single(
        M, C, u0, params, tile=32, storage_dtype=None)
    assert info["occupancy"] < 0.5

    Mf = jnp.asarray(M, jnp.float32)
    Cf = jnp.asarray(C, jnp.float32)
    u_d, F_d, _ = jax.jit(
        lambda M, C, u0: msrc_flat.flat_solve_single(
            msrc_flat.stacked_dual_matvec(M, C), u0, params))(
        Mf, Cf, jnp.asarray(u0))

    # Both storages must converge to the planted clique's support with the
    # same objective. Bit-identical masks are NOT the contract in f32: the
    # tile matvec sums in a different order, and omega rounding tie-breaks
    # among the clique's (equal-valued) entries can land on different
    # members of the same clique. Assert support parity and containment.
    assert set(np.nonzero(np.asarray(u_b) > 0)[0]) == set(cl)
    assert set(np.nonzero(np.asarray(u_d) > 0)[0]) == set(cl)
    np.testing.assert_allclose(float(F_b), float(F_d), rtol=1e-5)
    mask_b = np.asarray(msrc.round_solution(u_b, F_b, params.rounding))
    mask_d = np.asarray(msrc.round_solution(u_d, F_d, params.rounding))
    assert set(np.nonzero(mask_b)[0]) <= set(cl)
    assert set(np.nonzero(mask_d)[0]) <= set(cl)
    assert mask_b.sum() == mask_d.sum()
