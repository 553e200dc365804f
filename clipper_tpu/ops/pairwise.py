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

import jax.numpy as jnp

_GRAM_DIM_THRESHOLD = 8


def pairwise_sqdist_matrix(P: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix of the rows of P: (m, d) -> (m, m)."""
    m, d = P.shape
    if d <= _GRAM_DIM_THRESHOLD:
        sq = jnp.zeros((m, m), dtype=P.dtype)
        for k in range(d):
            diff = P[:, k, None] - P[None, :, k]
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
