"""Pallas fused affinity-build kernel.

Computes M and C tile-by-tile in one pass (reference semantics:
src/clipper.cpp:21-65 — invariant scores, distinctness + diagonal +
threshold masks, C = pattern of M) without materializing any intermediate
(m, m) arrays: each grid program loads a row/column block of the gathered
endpoints (tiny), evaluates the invariant's score_block in registers, applies
the masks, and writes the (TI, TJ) output tiles.

Generic over invariants: any PairwiseInvariant whose score_block is
expressible in Pallas-supported jnp ops (the built-ins use coordinate-
unrolled distances — no gathers, no reshapes) traces straight into the
kernel.

The same array is passed twice with different BlockSpec index maps to give
the kernel its row block and column block — the Pallas-native way to tile a
symmetric pairwise computation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clipper_tpu.invariants.base import PairwiseInvariant


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x, n):
    pad = n - x.shape[0]
    return x if pad == 0 else jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def build_affinity_pallas(
    invariant: PairwiseInvariant,
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    A: jnp.ndarray,
    *,
    affinityeps: float = 1e-4,
    tile: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense symmetric (M, C) from gathered endpoints, fused in Pallas.

    P1/P2: (m, d) endpoint arrays (P1[k] = D1[A[k,0]] etc.); A: (m, 2).
    Returns (m, m) M (zero diagonal) and C (0/1 pattern of M).
    """
    m = P1.shape[0]
    m_pad = -(-m // tile) * tile
    P1p = _pad_rows(P1, m_pad)
    P2p = _pad_rows(P2, m_pad)
    # padded association rows get sentinel -1: they match each other in the
    # distinctness test and are additionally killed by the validity mask
    Ap = jnp.pad(A, ((0, m_pad - m), (0, 0)), constant_values=-1)
    d = P1.shape[1]
    dtype = P1.dtype

    def kernel(P1r_ref, P1c_ref, P2r_ref, P2c_ref, Ar_ref, Ac_ref,
               M_ref, C_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        scores = invariant.score_block(P1r_ref[...], P1c_ref[...],
                                       P2r_ref[...], P2c_ref[...])
        Ar = Ar_ref[...]
        Ac = Ac_ref[...]
        distinct = ~((Ar[:, 0][:, None] == Ac[:, 0][None, :])
                     | (Ar[:, 1][:, None] == Ac[:, 1][None, :]))
        gr = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        gc = j * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        keep = distinct & (gr != gc) & (gr < m) & (gc < m)
        keep = keep & (scores > affinityeps)
        M_ref[...] = jnp.where(keep, scores, 0.0).astype(dtype)
        C_ref[...] = keep.astype(dtype)

    grid = (m_pad // tile, m_pad // tile)
    row_spec = pl.BlockSpec((tile, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((tile, d), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    arow_spec = pl.BlockSpec((tile, 2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    acol_spec = pl.BlockSpec((tile, 2), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    M, C = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, col_spec, row_spec, col_spec,
                  arow_spec, acol_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_pad, m_pad), dtype)] * 2,
        interpret=_use_interpret(),
    )(P1p, P1p, P2p, P2p, Ap, Ap)
    return M[:m, :m], C[:m, :m]


def score_consistency_stored_pallas(
    invariant: PairwiseInvariant,
    D1: jnp.ndarray,
    D2: jnp.ndarray,
    A: jnp.ndarray,
    *,
    affinityeps: float = 1e-4,
    m_true=None,
    storage_dtype=jnp.int8,
    tile: int = 256,
) -> jnp.ndarray:
    """Fused build of the stacked (2m, m) [M; C] storage — one HBM pass.

    Matches ``ops.affinity.score_consistency_stored`` (for symmetric
    invariants) but never touches HBM with anything full-precision: each
    grid program evaluates the invariant's ``score_block`` on a (tile, tile)
    patch in VMEM, applies the distinctness / diagonal / epsilon / padding
    masks (reference semantics: src/clipper.cpp:35-64), quantizes, and
    writes the int8 (or bf16) tile straight to the output. The XLA lowering
    of the dense build materializes several (m, m) f32 intermediates
    (distance matrices, scores) — ~4 full HBM round trips the fused kernel
    deletes; measured on the headline build stage in BENCH.md round 3.

    Both halves are written from ONE grid step: the output is laid out
    (2, m_pad, m_pad) — C-contiguous identical to the stacked (2 m_pad,
    m_pad), so the final reshape is free — and each program writes the
    (2, tile, tile) block holding its M tile and C tile. The previous
    design used a third grid axis s in {0, 1} with the C tile stashed in
    VMEM scratch; that doubles the grid steps and pays a second
    VMEM -> HBM sweep — measured ~1/2 of the pure-write floor at the
    headline point (build_probe round 4: writeonly floor 9.6 ms of the
    17.1 ms kernel at B=512, m=1024).

    Requires ``invariant.symmetric`` (both built-ins are); asymmetric
    custom invariants need the mirrored XLA path.
    """
    if not getattr(invariant, "symmetric", False):
        raise ValueError(
            "score_consistency_stored_pallas requires a symmetric "
            "invariant; use ops.affinity.score_consistency_stored")
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE

    m = A.shape[0]
    m_pad = -(-m // tile) * tile
    nT = m_pad // tile
    P1 = _pad_rows(D1[A[:, 0]], m_pad)
    P2 = _pad_rows(D2[A[:, 1]], m_pad)
    Ap = jnp.pad(A, ((0, m_pad - m), (0, 0)), constant_values=-1)
    d = P1.shape[1]
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8
    if m_true is None:
        m_true = m
    mt = jnp.reshape(jnp.asarray(m_true, jnp.int32), (1, 1))

    # column blocks are fed PRE-TRANSPOSED ((d, m) / (2, m)): the kernel's
    # (row, 1) x (1, col) broadcasts then need no in-kernel relayout —
    # Mosaic lowers a (tile, 1) -> (1, tile) transpose as a cross-lane
    # shuffle that dominated the v1 kernel (measured: 31.6 -> ~6 ms)
    P1t = P1.T
    P2t = P2.T
    Apt = Ap.T
    score_block_t = getattr(invariant, "score_block_t", None)
    if score_block_t is None:
        raise ValueError(
            "score_consistency_stored_pallas needs invariant.score_block_t "
            "(transposed column blocks); use ops.affinity."
            "score_consistency_stored for invariants without it")

    def kernel(mt_ref, P1r_ref, P1ct_ref, P2r_ref, P2ct_ref, Ar_ref,
               Act_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        scores = score_block_t(P1r_ref[...], P1ct_ref[...],
                               P2r_ref[...], P2ct_ref[...])
        Ar = Ar_ref[...]
        Act = Act_ref[...]
        distinct = ~(
            (jax.lax.slice_in_dim(Ar, 0, 1, axis=1)
             == jax.lax.slice_in_dim(Act, 0, 1, axis=0))
            | (jax.lax.slice_in_dim(Ar, 1, 2, axis=1)
               == jax.lax.slice_in_dim(Act, 1, 2, axis=0)))
        gr = i * tile + jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 0)
        gc = j * tile + jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 1)
        lim = mt_ref[0, 0]
        keep = (distinct & (gr != gc) & (gr < lim) & (gc < lim)
                & (scores > affinityeps))
        # selects stay in f32 until one final convert: Mosaic cannot
        # relayout the (8, 128)-tiled f32-comparison mask into the
        # (32, 128) int8 tiling an int8-select would need
        if is_int8:
            Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0)
                                    * _INT8_SCALE), 0, 127)
            Cq = jnp.where(keep, _INT8_SCALE, 0.0)
        else:
            Mq = jnp.where(keep, scores, 0.0)
            Cq = jnp.where(keep, 1.0, 0.0)
        out_ref[0] = Mq.astype(storage_dtype)
        out_ref[1] = Cq.astype(storage_dtype)

    grid = (nT, nT)
    row_spec = pl.BlockSpec((tile, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    colt_spec = pl.BlockSpec((d, tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    arow_spec = pl.BlockSpec((tile, 2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    acolt_spec = pl.BlockSpec((2, tile), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, tile, tile), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    MC3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  row_spec, colt_spec, row_spec, colt_spec,
                  arow_spec, acolt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, m_pad, m_pad), storage_dtype),
        # large tiles amortize per-program overhead (grid programs cost ~us
        # each; at tile=256 the 2(m/256)^2 programs dominate the build); the
        # f32 score intermediates of a 512-tile need more scoped VMEM than
        # the 16 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(mt, P1, P1t, P2, P2t, Ap, Apt)
    # (2, m_pad, m_pad) is C-contiguous identical to the stacked layout
    MC = MC3.reshape(2 * m_pad, m_pad)
    if m_pad == m:
        return MC
    # unpad: stacked halves move together
    return jnp.concatenate([MC[:m, :m], MC[m_pad:m_pad + m, :m]], axis=0)
