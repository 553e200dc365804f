"""Affinity / constraint matrix construction — the O(m^2) hot kernel.

Reference semantics (reference: src/clipper.cpp:21-65):

  * If no associations are given, use the all-to-all hypothesis
    (reference: src/clipper.cpp:24, include/clipper/utils.h:61-71).
  * For each unordered pair (i, j) of associations, skip (score 0) if they
    share an endpoint in either dataset — the distinctness constraint
    (reference: src/clipper.cpp:35-38).
  * Otherwise score with the pairwise invariant; keep only scores strictly
    above ``affinityeps`` (reference: src/clipper.cpp:52-55).
  * M has an implicit identity diagonal handled inside the solver
    (reference: src/clipper.cpp:58-59,194); here the stored diagonal is zero.
  * C is the 0/1 pattern of M (reference: src/clipper.cpp:63-64).

TPU-native design: instead of an OpenMP loop over flat upper-triangle indices
with per-pair virtual dispatch, we gather the four endpoint arrays once and
evaluate the invariant on the whole (m, m) grid — dense, fused, masked. The
result is the full symmetric matrix (both triangles), zero diagonal.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.types import as_association


def create_all_to_all(n1: int, n2: int) -> jnp.ndarray:
    """All-to-all association hypothesis, row-major over (i, j).

    Matches the reference layout A[k] = (k // n2, k % n2)
    (reference: include/clipper/utils.h:61-71, asserted by
    test/affinity_test.cpp:66-72).
    """
    i = jnp.repeat(jnp.arange(n1, dtype=jnp.int32), n2)
    j = jnp.tile(jnp.arange(n2, dtype=jnp.int32), n1)
    return jnp.stack([i, j], axis=1)


def distinctness_mask(A: jnp.ndarray) -> jnp.ndarray:
    """(m, m) bool mask: True where associations i and j are distinct.

    False (masked out) where A[i,0]==A[j,0] or A[i,1]==A[j,1]
    (reference: src/clipper.cpp:35-38). Diagonal is False.
    """
    same1 = A[:, 0, None] == A[None, :, 0]
    same2 = A[:, 1, None] == A[None, :, 1]
    return ~(same1 | same2)


def build_affinity(
    invariant: PairwiseInvariant,
    D1: jnp.ndarray,
    D2: jnp.ndarray,
    A: Optional[jnp.ndarray] = None,
    *,
    affinityeps: float = 1e-4,
    dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build dense symmetric (M, C) from data and associations.

    Args:
        invariant: pairwise invariant scoring function.
        D1: (n1, d) dataset 1, points as rows.
        D2: (n2, d) dataset 2, points as rows.
        A: (m, 2) int putative associations, or None for all-to-all.
        affinityeps: sparsity threshold; scores <= affinityeps are dropped
            (reference: include/clipper/clipper.h:42).
        dtype: computation dtype (defaults to D1.dtype).

    Returns:
        (M, C, A): (m, m) affinity with zero diagonal, (m, m) 0/1 constraint
        pattern of M, and the (m, 2) association array actually used.
    """
    if A is None:
        A = create_all_to_all(D1.shape[0], D2.shape[0])
    A = as_association(A)
    if dtype is None:
        dtype = jnp.asarray(D1).dtype

    M, C = score_pairwise_consistency(invariant, jnp.asarray(D1, dtype),
                                      jnp.asarray(D2, dtype), A,
                                      affinityeps=affinityeps)
    return M, C, A


def score_pairwise_consistency(
    invariant: PairwiseInvariant,
    D1: jnp.ndarray,
    D2: jnp.ndarray,
    A: jnp.ndarray,
    *,
    affinityeps: float = 1e-4,
    m_true=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jit-friendly core: dense symmetric (M, C) for fixed association set.

    m_true: optional scalar — rows/cols >= m_true are zeroed in both M and C
    (exact padding for bucketed mixed-size batching: padded entries get no
    edges and no constraints, so they stay at zero through the solver — the
    same argument as parallel.sharded.pad_problem).
    """
    P1 = D1[A[:, 0]]   # (m, d) endpoints in dataset 1
    P2 = D2[A[:, 1]]   # (m, d) endpoints in dataset 2

    scores = invariant.score_matrix(P1, P2)

    keep = distinctness_mask(A)
    keep = keep & (scores > affinityeps)
    if m_true is not None:
        valid = jnp.arange(A.shape[0]) < m_true
        keep = keep & valid[:, None] & valid[None, :]

    if getattr(invariant, "symmetric", False):
        # one-pass build: score_matrix is exchange-symmetric bitwise for
        # declared-symmetric invariants (both built-ins compute one Gram
        # distance matrix for both triangles), so no mirror round-trip —
        # the masks + (downstream) quantization fuse into the score sweep
        M = jnp.where(keep, scores, 0.0).astype(scores.dtype)
        C = keep.astype(scores.dtype)
        return M, C

    # The reference computes the strict upper triangle and mirrors it
    # (reference: src/clipper.cpp:31-32, getAffinityMatrix selfadjointView at
    # src/clipper.cpp:133). Mirroring the upper triangle here guarantees an
    # exactly symmetric M even for asymmetric custom invariants.
    Mu = jnp.triu(jnp.where(keep, scores, 0.0), k=1)
    M = (Mu + Mu.T).astype(scores.dtype)
    Cu = jnp.triu(keep, k=1)
    C = (Cu | Cu.T).astype(scores.dtype)
    return M, C


def score_consistency_stored(
    invariant: PairwiseInvariant,
    D1: jnp.ndarray,
    D2: jnp.ndarray,
    A: jnp.ndarray,
    *,
    affinityeps: float = 1e-4,
    m_true=None,
    storage_dtype=jnp.int8,
) -> jnp.ndarray:
    """Stacked (2m, m) [M; C] built DIRECTLY in the storage dtype.

    Bit-identical to ``quantize_stacked(concat(score_pairwise_consistency))``
    (/ ``.astype`` for bf16) but never materializes the full-precision C or
    the full-precision stacked concat: C is 0/1 so its int8 quantization is
    exactly ``127 * keep`` straight from the bool mask, and M's quantization
    is an elementwise epilogue XLA fuses into the score sweep. This removes
    the f32 C write/read and quarters the concat traffic — the build stage
    was ~20% of the round-1 headline pipeline (BENCH.md).

    Reference semantics anchor: masks from src/clipper.cpp:35-55, C as the
    0/1 pattern of M from src/clipper.cpp:63-64.
    """
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE

    P1 = D1[A[:, 0]]
    P2 = D2[A[:, 1]]
    scores = invariant.score_matrix(P1, P2)

    keep = distinctness_mask(A) & (scores > affinityeps)
    if m_true is not None:
        valid = jnp.arange(A.shape[0]) < m_true
        keep = keep & valid[:, None] & valid[None, :]

    if not getattr(invariant, "symmetric", False):
        # exact-symmetry guarantee for custom invariants (mirror upper)
        keep = jnp.triu(keep, k=1)
        scores = jnp.where(keep, scores, 0.0)
        scores = scores + scores.T
        keep = keep | keep.T

    is_int8 = jnp.dtype(storage_dtype) == jnp.int8
    if is_int8:
        Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0) * _INT8_SCALE),
                      0, 127).astype(jnp.int8)
        Cq = jnp.where(keep, jnp.int8(int(_INT8_SCALE)), jnp.int8(0))
    else:
        Mq = jnp.where(keep, scores, 0.0).astype(storage_dtype)
        Cq = keep.astype(storage_dtype)
    return jnp.concatenate([Mq, Cq], axis=0)
