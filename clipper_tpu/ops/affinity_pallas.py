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
