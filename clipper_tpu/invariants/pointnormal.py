"""Point-normal pairwise invariant (planes / surfels / patches).

Semantics match the reference
(reference: src/invariants/pointnormal_distance.cpp:13-35, defaults from
include/clipper/invariants/pointnormal_distance.h:25-31). A datum is a
6-vector: first 3 entries a point, last 3 a unit normal
(reference: include/clipper/invariants/pointnormal_distance.h:19-20).

    l1, l2   = intra-set point distances
    a1, a2   = intra-set normal angles  acos(ni . nj)
    dp = |l1 - l2|,  dn = |a1 - a2|
    score = exp(-dp^2/(2 sigp^2)) * exp(-dn^2/(2 sign^2))   if dp<epsp and dn<epsn
            0                                               otherwise

Note: the reference calls std::acos on the raw dot product, which yields NaN
for dots marginally outside [-1, 1]; we clamp to [-1, 1] first (strictly more
robust, identical for valid unit normals).

The "plane invariant" use case is covered by massaging plane parameters into
point-normal form as in the reference example
(reference: examples/matlab/ex3_planecloud.m:84-86).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.ops.pairwise import (
    cross_distance_matrix,
    cross_distance_rt,
    pairwise_distance_matrix,
    pairwise_inner_matrix,
)


@dataclasses.dataclass(frozen=True)
class PointNormalDistanceParams:
    sigp: float = 0.5    # point: spread of exponential kernel
    epsp: float = 0.5    # point: consistency bound
    sign: float = 0.10   # normal: spread of exponential kernel
    epsn: float = 0.35   # normal: consistency bound


class PointNormalDistance(PairwiseInvariant):
    symmetric = True

    def __init__(self, params: PointNormalDistanceParams = PointNormalDistanceParams()):
        self.params = params

    def _score(self, l1, l2, a1, a2):
        p = self.params
        dp = jnp.abs(l1 - l2)
        dn = jnp.abs(a1 - a2)
        sp = jnp.exp(-0.5 * dp * dp / (p.sigp * p.sigp))
        sn = jnp.exp(-0.5 * dn * dn / (p.sign * p.sign))
        return jnp.where((dp < p.epsp) & (dn < p.epsn), sp * sn, 0.0)

    @staticmethod
    def _angle(ni, nj):
        dot = jnp.sum(ni * nj, axis=-1)
        return jnp.arccos(jnp.clip(dot, -1.0, 1.0))

    def __call__(self, ai, aj, bi, bj):
        l1 = jnp.linalg.norm(ai[..., :3] - aj[..., :3], axis=-1)
        l2 = jnp.linalg.norm(bi[..., :3] - bj[..., :3], axis=-1)
        a1 = self._angle(ai[..., 3:6], aj[..., 3:6])
        a2 = self._angle(bi[..., 3:6], bj[..., 3:6])
        return self._score(l1, l2, a1, a2)

    def score_matrix(self, P1, P2):
        l1 = pairwise_distance_matrix(P1[:, :3])
        l2 = pairwise_distance_matrix(P2[:, :3])
        a1 = jnp.arccos(jnp.clip(pairwise_inner_matrix(P1[:, 3:6]), -1.0, 1.0))
        a2 = jnp.arccos(jnp.clip(pairwise_inner_matrix(P2[:, 3:6]), -1.0, 1.0))
        return self._score(l1, l2, a1, a2)

    def score_block(self, P1r, P1c, P2r, P2c):
        l1 = cross_distance_matrix(P1r[:, :3], P1c[:, :3])
        l2 = cross_distance_matrix(P2r[:, :3], P2c[:, :3])
        a1 = jnp.arccos(jnp.clip(P1r[:, 3:6] @ P1c[:, 3:6].T, -1.0, 1.0))
        a2 = jnp.arccos(jnp.clip(P2r[:, 3:6] @ P2c[:, 3:6].T, -1.0, 1.0))
        return self._score(l1, l2, a1, a2)

    def score_block_t(self, P1r, P1ct, P2r, P2ct):
        # column blocks pre-transposed ((6, mc)) — the Pallas fused-build
        # fast path; same contractions, bit-identical to score_block
        l1 = cross_distance_rt(P1r[:, :3], P1ct[:3, :])
        l2 = cross_distance_rt(P2r[:, :3], P2ct[:3, :])
        a1 = jnp.arccos(jnp.clip(P1r[:, 3:6] @ P1ct[3:6, :], -1.0, 1.0))
        a2 = jnp.arccos(jnp.clip(P2r[:, 3:6] @ P2ct[3:6, :], -1.0, 1.0))
        return self._score(l1, l2, a1, a2)
