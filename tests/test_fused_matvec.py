"""Pallas fused dual-matvec kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.ops import fused_matvec
from clipper_tpu.solvers import msrc, msrc_flat


def test_pattern_dual_matvec_matches_dense():
    rng = np.random.default_rng(0)
    B, m = 2, 512
    M = np.where(rng.uniform(size=(B, m, m)) < 0.1,
                 rng.uniform(size=(B, m, m)), 0.0).astype(np.float32)
    for b in range(B):
        Mu_ = np.triu(M[b], 1)
        M[b] = Mu_ + Mu_.T
    u = rng.uniform(size=(B, m)).astype(np.float32)

    Mu, Cu = fused_matvec.pattern_dual_matvec(jnp.asarray(M), jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(Mu),
                               np.einsum("bij,bj->bi", M, u), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(Cu),
        np.einsum("bij,bj->bi", (M > 0).astype(np.float32), u), atol=1e-3)


def test_flat_solver_with_fused_kernel_matches_stacked():
    rng = np.random.default_rng(1)
    m = 256
    W = np.where(rng.uniform(size=(m, m)) < 0.2, rng.uniform(size=(m, m)),
                 0.0)
    Wu = np.triu(W, 1)
    M = (Wu + Wu.T).astype(np.float32)
    C = (M > 0).astype(np.float32)
    u0 = rng.uniform(size=m).astype(np.float32)

    Mj, Cj, u0j = jnp.asarray(M), jnp.asarray(C), jnp.asarray(u0)
    u_s, F_s, i_s = msrc_flat.flat_solve_single(
        msrc_flat.stacked_dual_matvec(Mj, Cj), u0j, ct.Params())
    u_f, F_f, i_f = msrc_flat.flat_solve_single(
        fused_matvec.make_pattern_dual_matvec(Mj), u0j, ct.Params())

    # same support is what matters (fp paths differ slightly)
    mask_s = np.asarray(msrc.round_solution(u_s, F_s))
    mask_f = np.asarray(msrc.round_solution(u_f, F_f))
    assert (mask_s == mask_f).all()
    assert abs(float(F_s) - float(F_f)) < 0.05 * max(1.0, abs(float(F_s)))


def test_bf16_storage_with_f32_polish():
    """bf16 iteration + f32 objective re-evaluation: same selection."""
    rng = np.random.default_rng(2)
    m = 256
    W = np.where(rng.uniform(size=(m, m)) < 0.15, rng.uniform(size=(m, m)),
                 0.0)
    Wu = np.triu(W, 1)
    # plant a clique so there is a clear answer
    nodes = [3, 50, 99, 140, 200, 230]
    for a in range(len(nodes)):
        for b in range(a + 1, len(nodes)):
            Wu[min(nodes[a], nodes[b]), max(nodes[a], nodes[b])] = 0.97
    M = (Wu + Wu.T).astype(np.float32)
    C = (M > 0).astype(np.float32)
    u0 = rng.uniform(size=m).astype(np.float32)

    Mj, Cj, u0j = jnp.asarray(M), jnp.asarray(C), jnp.asarray(u0)
    u32, F32, _ = msrc_flat.flat_solve_single(
        msrc_flat.stacked_dual_matvec(Mj, Cj), u0j, ct.Params())
    mask32 = np.asarray(msrc.round_solution(u32, F32))

    mv16 = fused_matvec.make_pattern_dual_matvec(Mj.astype(jnp.bfloat16))
    u16, F16, _ = msrc_flat.flat_solve_single(
        lambda u: tuple(x.astype(jnp.float32) for x in mv16(u)),
        u0j, ct.Params())
    F16p = msrc_flat.recompute_objective(
        msrc_flat.stacked_dual_matvec(Mj, Cj), u16)
    mask16 = np.asarray(msrc.round_solution(u16, F16p))

    assert set(np.flatnonzero(mask16)) >= set(nodes)
    assert (mask16 == mask32).all()
