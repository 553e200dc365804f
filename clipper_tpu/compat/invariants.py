"""clipperpy.invariants-compatible namespace
(reference: bindings/python/py_clipper.cpp:25-83)."""

from __future__ import annotations

import dataclasses

from clipper_tpu.invariants import base as _base
from clipper_tpu.invariants import euclidean as _euclidean
from clipper_tpu.invariants import pointnormal as _pointnormal

Invariant = _base.Invariant
PairwiseInvariant = _base.PairwiseInvariant


class EuclideanDistanceParams:
    def __init__(self):
        for f in dataclasses.fields(_euclidean.EuclideanDistanceParams):
            setattr(self, f.name, f.default)

    def _freeze(self):
        return _euclidean.EuclideanDistanceParams(
            sigma=self.sigma, epsilon=self.epsilon, mindist=self.mindist)

    def __repr__(self):
        return (f"<EuclideanDistanceParams : sigma={self.sigma}"
                f" epsilon={self.epsilon} mindist={self.mindist}>")


def EuclideanDistance(params=None):
    frozen = params._freeze() if isinstance(params, EuclideanDistanceParams) \
        else (params or _euclidean.EuclideanDistanceParams())
    return _euclidean.EuclideanDistance(frozen)


class PointNormalDistanceParams:
    def __init__(self):
        for f in dataclasses.fields(_pointnormal.PointNormalDistanceParams):
            setattr(self, f.name, f.default)

    def _freeze(self):
        return _pointnormal.PointNormalDistanceParams(
            sigp=self.sigp, epsp=self.epsp, sign=self.sign, epsn=self.epsn)

    def __repr__(self):
        return (f"<PointNormalDistanceParams : sigp={self.sigp}"
                f" epsp={self.epsp} sign={self.sign} epsn={self.epsn}>")


def PointNormalDistance(params=None):
    frozen = params._freeze() if isinstance(params, PointNormalDistanceParams) \
        else (params or _pointnormal.PointNormalDistanceParams())
    return _pointnormal.PointNormalDistance(frozen)
