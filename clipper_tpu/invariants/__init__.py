from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.invariants.euclidean import EuclideanDistance, EuclideanDistanceParams
from clipper_tpu.invariants.pointnormal import (
    PointNormalDistance,
    PointNormalDistanceParams,
)

__all__ = [
    "PairwiseInvariant",
    "EuclideanDistance", "EuclideanDistanceParams",
    "PointNormalDistance", "PointNormalDistanceParams",
]
