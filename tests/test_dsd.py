"""DSD oracle tests.

Ports the reference's fixed 20x20 golden test (reference: test/dsd_test.cpp,
known densest subgraph {3, 5, 12, 14, 15}) plus the restricted-subgraph
variant, and cross-checks the native C++ path against the Python fallback.
"""

import numpy as np
import pytest

from clipper_tpu.native import build as native_build
from clipper_tpu.solvers import dsd

TRUE_NODES = [3, 5, 12, 14, 15]

# fixed affinity matrix with known densest subgraph
# (reference: test/dsd_test.cpp:16-36); upper triangle listed, symmetrized.
_EDGES = {
    (0, 18): 0.2964, (1, 13): 0.0138, (2, 11): 0.0016, (2, 18): 0.0747,
    (3, 5): 0.0555, (3, 6): 0.2547, (3, 13): 0.0102, (3, 15): 0.7715,
    (4, 5): 0.0063, (4, 7): 0.3846, (4, 9): 0.0003, (4, 10): 0.0014,
    (4, 15): 0.0063, (5, 12): 0.9927, (5, 15): 0.9722, (6, 8): 0.0023,
    (6, 11): 0.8775, (7, 8): 0.0001, (8, 9): 0.7914, (8, 13): 0.0617,
    (8, 16): 0.9938, (8, 19): 0.0007, (9, 12): 0.0001, (9, 13): 0.0091,
    (9, 15): 0.2503, (9, 16): 0.0222, (9, 17): 0.0549, (10, 19): 0.0008,
    (11, 18): 0.7007, (12, 14): 0.9978, (13, 17): 0.0003, (14, 15): 0.0012,
    (14, 19): 0.0074, (15, 16): 0.0026, (15, 17): 0.0217, (17, 18): 0.0007,
}


def golden_matrix():
    M = np.eye(20)
    for (i, j), w in _EDGES.items():
        M[i, j] = M[j, i] = w
    return M


def test_dsd_solve():
    nodes = dsd.solve(golden_matrix())
    assert nodes == TRUE_NODES


def test_dsd_solve_restricted():
    S = [0, 1, 3, 5, 7, 12, 14, 15, 19]
    nodes = dsd.solve(golden_matrix(), S)
    assert nodes == TRUE_NODES


def test_native_matches_python_fallback():
    M = golden_matrix()
    lib = native_build.load()
    if lib is None:
        pytest.skip("native library unavailable")
    native = dsd._solve_native(lib, 20, np.arange(20, dtype=np.int64),
                               np.triu(M, 1) + np.triu(M, 1).T)
    W = np.triu(M, 1)
    W = W + W.T
    python = dsd._solve_python(20, np.arange(20, dtype=np.int64), W)
    assert native == python == TRUE_NODES


def test_random_graphs_native_vs_python():
    rng = np.random.default_rng(11)
    for _ in range(5):
        n = 12
        W = np.triu(rng.uniform(size=(n, n)) * (rng.uniform(size=(n, n)) < 0.3), 1)
        M = W + W.T
        lib = native_build.load()
        if lib is None:
            pytest.skip("native library unavailable")
        a = dsd._solve_native(lib, n, np.arange(n, dtype=np.int64), M)
        b = dsd._solve_python(n, np.arange(n, dtype=np.int64), M)
        assert a == b


def test_dense_planted_clique():
    # plant a heavy 5-clique among weak noise; DSD must recover it
    rng = np.random.default_rng(5)
    n = 30
    W = np.triu(rng.uniform(0, 0.05, size=(n, n)), 1)
    clique = [2, 7, 13, 21, 28]
    for a in range(5):
        for b in range(a + 1, 5):
            W[clique[a], clique[b]] = 0.95 + rng.uniform(0, 0.05)
    M = W + W.T
    nodes = dsd.solve(M)
    assert set(clique).issubset(set(nodes))
