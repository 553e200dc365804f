"""Euclidean-distance pairwise invariant.

Semantics match the reference exactly
(reference: src/invariants/euclidean_distance.cpp:13-31, defaults from
include/clipper/invariants/euclidean_distance.h:22-27):

    l1 = ||ai - aj||,  l2 = ||bi - bj||        (intra-set distances)
    0                                  if mindist > 0 and min(l1, l2) < mindist
    c = |l1 - l2|
    exp(-c^2 / (2 sigma^2))            if c < epsilon
    0                                  otherwise
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.ops.pairwise import (
    cross_distance_matrix,
    cross_distance_rt,
    pairwise_distance_matrix,
)


@dataclasses.dataclass(frozen=True)
class EuclideanDistanceParams:
    sigma: float = 0.01     # spread ("variance") of the exponential kernel
    epsilon: float = 0.06   # consistency bound: inlier/outlier gate
    mindist: float = 0.0    # min allowable intra-set distance between inliers


class EuclideanDistance(PairwiseInvariant):
    symmetric = True  # |l_i - l_j| is exchange-invariant (bitwise: the Gram
                      # distance matrix is computed once for both triangles)

    def __init__(self, params: EuclideanDistanceParams = EuclideanDistanceParams()):
        self.params = params

    def _score_from_lengths(self, l1, l2):
        p = self.params
        c = jnp.abs(l1 - l2)
        scr = jnp.where(c < p.epsilon,
                        jnp.exp(-0.5 * c * c / (p.sigma * p.sigma)),
                        0.0)
        if p.mindist > 0:
            scr = jnp.where((l1 < p.mindist) | (l2 < p.mindist), 0.0, scr)
        return scr

    def __call__(self, ai, aj, bi, bj):
        l1 = jnp.linalg.norm(ai - aj, axis=-1)
        l2 = jnp.linalg.norm(bi - bj, axis=-1)
        return self._score_from_lengths(l1, l2)

    def score_matrix(self, P1, P2):
        # Gram-matrix distance computation: the O(m^2 d) work becomes two
        # MXU matmuls instead of an (m, m, d) broadcast difference.
        l1 = pairwise_distance_matrix(P1)
        l2 = pairwise_distance_matrix(P2)
        return self._score_from_lengths(l1, l2)

    def score_block(self, P1r, P1c, P2r, P2c):
        l1 = cross_distance_matrix(P1r, P1c)
        l2 = cross_distance_matrix(P2r, P2c)
        return self._score_from_lengths(l1, l2)

    def score_block_t(self, P1r, P1ct, P2r, P2ct):
        # column blocks pre-transposed — the Pallas fused-build fast path
        # (no in-kernel relayouts); arithmetic bit-identical to score_block
        l1 = cross_distance_rt(P1r, P1ct)
        l2 = cross_distance_rt(P2r, P2ct)
        return self._score_from_lengths(l1, l2)
