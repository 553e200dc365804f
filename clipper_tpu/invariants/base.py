"""Invariant protocol: vectorized geometric-consistency scoring.

The reference defines an abstract per-pair virtual functor
``PairwiseInvariant::operator()(ai, aj, bi, bj) -> double``
(reference: include/clipper/invariants/abstract.h:56-72) that is called once
per association pair inside an OpenMP loop (reference: src/clipper.cpp:52).
Custom Python invariants cross the C++→Python boundary per pair through a
pybind11 trampoline (reference: bindings/python/trampolines.h:20-30), which is
the documented ~1000x slowdown.

TPU-native design: an invariant is any JAX-traceable callable operating on
*arrays* of endpoints with broadcasting —

    scores = invariant(ai, aj, bi, bj)   # (..., d) x4 -> (...)

so a user-defined invariant written in jnp is fused into the affinity build at
zero overhead (it is traced, not called per pair). Built-in invariants
additionally override :meth:`score_matrix`, a structured fast path that
computes the full (m, m) score matrix from gathered endpoint arrays using
Gram-matrix (MXU matmul) identities instead of materializing (m, m, d)
broadcast differences.
"""

from __future__ import annotations

import jax.numpy as jnp


class PairwiseInvariant:
    """Base class for pairwise geometric invariants.

    Subclasses must implement :meth:`__call__` as a broadcasting, elementwise
    (over leading dims) jnp function. Overriding :meth:`score_matrix` is
    optional but recommended for custom invariants with matmul structure.

    ``symmetric``: declare True when score(i, j) == score(j, i) exactly
    (both built-ins are). Symmetric invariants unlock one-pass affinity
    builds (no upper-triangle mirror) in the pool engine and are required
    by the sharded engine, which computes both triangles independently.
    """

    symmetric: bool = False

    def __call__(self, ai, aj, bi, bj):
        """Score consistency of associations (ai->bi) and (aj->bj).

        Args:
            ai, aj: (..., d) endpoints from dataset 1.
            bi, bj: (..., d) endpoints from dataset 2.

        Returns:
            (...,) consistency scores in [0, 1].
        """
        raise NotImplementedError

    def score_matrix(self, P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
        """Full (m, m) pairwise score matrix from gathered endpoints.

        ``P1[k] = D1[A[k, 0]]`` and ``P2[k] = D2[A[k, 1]]`` are the (m, d)
        endpoint arrays of the m putative associations. Entry (i, j) scores
        the mutual consistency of associations i and j.

        Default: broadcast :meth:`__call__` over the (m, m) pair grid. XLA
        fuses this, but it materializes (m, m, d) intermediates; built-ins
        override with Gram-matrix forms.
        """
        ai = P1[:, None, :]
        aj = P1[None, :, :]
        bi = P2[:, None, :]
        bj = P2[None, :, :]
        return self(ai, aj, bi, bj)

    def score_block(self, P1r, P1c, P2r, P2c) -> jnp.ndarray:
        """(mr, mc) score tile between a row block and a column block.

        Used by the sharded / tiled affinity build: entry (i, j) scores
        association row-block[i] against column-block[j]. Must equal the
        corresponding tile of :meth:`score_matrix`. Default: broadcast
        :meth:`__call__`.
        """
        return self(P1r[:, None, :], P1c[None, :, :],
                    P2r[:, None, :], P2c[None, :, :])


# Class-hierarchy parity with the reference (reference:
# include/clipper/invariants/abstract.h:37-52 declares an `Invariant` base
# above `PairwiseInvariant`). In this framework every invariant is a
# traceable callable, so the alias is the base.
Invariant = PairwiseInvariant
