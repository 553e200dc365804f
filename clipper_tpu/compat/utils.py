"""clipperpy.utils-compatible namespace
(reference: bindings/python/py_clipper.cpp:87-99)."""

import numpy as np

from clipper_tpu.ops.affinity import create_all_to_all as _all_to_all
from clipper_tpu.utils import k2ij as _k2ij


def create_all_to_all(n1: int, n2: int) -> np.ndarray:
    return np.asarray(_all_to_all(n1, n2))


def k2ij(k: int, n: int):
    i, j = _k2ij(k, n)
    return int(i), int(j)
