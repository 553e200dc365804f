"""Pairwise-distance primitives for affinity construction.

The O(m^2 d) intra-set distance matrix is the inner structure of the affinity
build (reference: src/clipper.cpp:31-55 computes it pairwise inside an OpenMP
loop). On TPU we compute it whole:

- small d (point clouds, d<=8): coordinate-unrolled broadcast differences.
  XLA fuses the d (m, m) elementwise squares into one VPU pass; numerically
  exact (no Gram cancellation) and no (m, m, d) intermediate.
- large d: Gram-matrix identity ||x-y||^2 = ||x||^2 + ||y||^2 - 2 x.y, which
  routes the contraction through the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAM_DIM_THRESHOLD = 8


def _col(P: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th coordinate of every row as an (m, 1) column.

    ``lax.slice_in_dim`` instead of ``P[:, k, None]``: the latter lowers to
    a gather, which Mosaic (Pallas TPU) cannot lower inside a kernel; the
    static slice is supported everywhere and XLA fuses both identically.
    """
    return jax.lax.slice_in_dim(P, k, k + 1, axis=1)


def pairwise_sqdist_matrix(P: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix of the rows of P: (m, d) -> (m, m)."""
    m, d = P.shape
    if d <= _GRAM_DIM_THRESHOLD:
        sq = jnp.zeros((m, m), dtype=P.dtype)
        for k in range(d):
            col = _col(P, k)
            diff = col - col.reshape(1, m)
            sq = sq + diff * diff
        return sq
    g = P @ P.T
    sq = jnp.diagonal(g)
    out = sq[:, None] + sq[None, :] - 2.0 * g
    return jnp.maximum(out, 0.0)


def pairwise_distance_matrix(P: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix of the rows of P: (m, d) -> (m, m)."""
    return jnp.sqrt(pairwise_sqdist_matrix(P))


def pairwise_inner_matrix(P: jnp.ndarray) -> jnp.ndarray:
    """Inner-product (Gram) matrix of the rows of P: (m, d) -> (m, m)."""
    return P @ P.T


def cross_sqdist_matrix(Pr: jnp.ndarray, Pc: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between row sets: (mr, d) x (mc, d) -> (mr, mc).

    Block form of :func:`pairwise_sqdist_matrix` for sharded / tiled affinity
    construction where the row block and column block differ.
    """
    mr, d = Pr.shape
    mc = Pc.shape[0]
    if d <= _GRAM_DIM_THRESHOLD:
        sq = jnp.zeros((mr, mc), dtype=Pr.dtype)
        for k in range(d):
            diff = _col(Pr, k) - _col(Pc, k).reshape(1, mc)
            sq = sq + diff * diff
        return sq
    g = Pr @ Pc.T
    out = (jnp.sum(Pr * Pr, axis=1)[:, None]
           + jnp.sum(Pc * Pc, axis=1)[None, :] - 2.0 * g)
    return jnp.maximum(out, 0.0)


def cross_distance_matrix(Pr: jnp.ndarray, Pc: jnp.ndarray) -> jnp.ndarray:
    """Distances between row sets: (mr, d) x (mc, d) -> (mr, mc)."""
    return jnp.sqrt(cross_sqdist_matrix(Pr, Pc))


def cross_sqdist_rt(Pr: jnp.ndarray, Pct: jnp.ndarray) -> jnp.ndarray:
    """Squared distances, column set pre-transposed: (mr, d) x (d, mc).

    Bit-identical arithmetic to :func:`cross_sqdist_matrix` (same operand
    values, same order), but the (1, mc) row slice comes from an already-
    transposed array — inside a Pallas kernel this avoids a per-tile
    (mc, 1) -> (1, mc) relayout, which Mosaic lowers as an expensive
    cross-lane shuffle (measured dominating the fused affinity build).
    """
    mr, d = Pr.shape
    sq = jnp.zeros((mr, Pct.shape[1]), dtype=Pr.dtype)
    for k in range(d):
        diff = _col(Pr, k) - jax.lax.slice_in_dim(Pct, k, k + 1, axis=0)
        sq = sq + diff * diff
    return sq


def cross_distance_rt(Pr: jnp.ndarray, Pct: jnp.ndarray) -> jnp.ndarray:
    """Distances, column set pre-transposed: (mr, d) x (d, mc) -> (mr, mc)."""
    return jnp.sqrt(cross_sqdist_rt(Pr, Pct))
