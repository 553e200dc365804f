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


def randvec(n: int, seed=None) -> np.ndarray:
    """U[0,1) vector (reference: src/utils.cpp:22-29).

    The reference uses a global C++ RNG; here an optional seed gives
    reproducibility (pass a jax PRNG key to the core API for the
    TPU-native path).
    """
    return np.random.default_rng(seed).uniform(size=n)


def find_indices_of_k_largest(x, k: int):
    from clipper_tpu import utils as _u
    return _u.find_indices_of_k_largest(np.asarray(x), int(k))


def find_indices_where_above_threshold(x, thr: float):
    from clipper_tpu import utils as _u
    return _u.find_indices_where_above_threshold(np.asarray(x), float(thr))


def select_from_indicator(x, ind):
    from clipper_tpu import utils as _u
    return _u.select_from_indicator(np.asarray(x), np.asarray(ind))


def select_inlier_associations(soln, A) -> np.ndarray:
    from clipper_tpu import utils as _u
    return _u.select_inlier_associations(soln, np.asarray(A))
