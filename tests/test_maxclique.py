"""Max-clique solver tests: exact B&B, heuristic, k-core (native + JAX)."""

import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.ops import kcore
from clipper_tpu.solvers import maxclique


def planted_clique_graph(rng, n=60, k=8, p=0.15):
    adj = (rng.uniform(size=(n, n)) < p)
    adj = np.triu(adj, 1)
    nodes = rng.choice(n, size=k, replace=False)
    for a in range(k):
        for b in range(a + 1, k):
            adj[min(nodes[a], nodes[b]), max(nodes[a], nodes[b])] = True
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    return adj, sorted(int(v) for v in nodes)


def brute_force_max_clique(adj):
    """Exponential oracle for tiny graphs."""
    n = adj.shape[0]
    best = []
    for mask in range(1 << n):
        nodes = [i for i in range(n) if mask >> i & 1]
        if len(nodes) <= len(best):
            continue
        if all(adj[a, b] for i, a in enumerate(nodes) for b in nodes[i + 1:]):
            best = nodes
    return best


def test_exact_vs_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 14
        adj = rng.uniform(size=(n, n)) < 0.5
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        ours = maxclique.solve(adj, maxclique.Params(method=maxclique.Method.EXACT))
        oracle = brute_force_max_clique(adj)
        assert len(ours) == len(oracle), f"trial {trial}"
        # verify it IS a clique
        for i, a in enumerate(ours):
            for b in ours[i + 1:]:
                assert adj[a, b]


def test_exact_planted():
    rng = np.random.default_rng(1)
    adj, nodes = planted_clique_graph(rng)
    found = maxclique.solve(adj, maxclique.Params(method=maxclique.Method.EXACT))
    assert found == nodes


def test_heu_finds_planted():
    rng = np.random.default_rng(2)
    adj, nodes = planted_clique_graph(rng, n=80, k=10, p=0.1)
    found = maxclique.solve(adj, maxclique.Params(method=maxclique.Method.HEU))
    # heuristic: must be a clique at least as large as planted... it may find
    # the planted one exactly in this easy regime
    assert len(found) >= len(nodes) - 1
    for i, a in enumerate(found):
        for b in found[i + 1:]:
            assert adj[a, b]


def test_exact_parallel_matches_serial():
    """threads>1 must find a clique of the same (maximum) size as threads=1
    on a hard dense random graph where the B&B actually branches."""
    rng = np.random.default_rng(11)
    n = 200
    adj = rng.uniform(size=(n, n)) < 0.5
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    serial = maxclique.solve(
        adj, maxclique.Params(method=maxclique.Method.EXACT, threads=1))
    parallel = maxclique.solve(
        adj, maxclique.Params(method=maxclique.Method.EXACT, threads=4))
    assert len(parallel) == len(serial)
    for i, a in enumerate(parallel):
        for b in parallel[i + 1:]:
            assert adj[a, b]


def test_kcore_numbers_native_vs_python_vs_jax():
    rng = np.random.default_rng(3)
    adj = rng.uniform(size=(40, 40)) < 0.2
    adj = np.triu(adj, 1)
    adj = adj | adj.T

    c_py = maxclique._core_numbers_python(adj.astype(np.uint8))
    c_nat = maxclique.core_numbers(adj)
    c_jax = np.asarray(kcore.core_numbers(adj))
    np.testing.assert_array_equal(c_nat, c_py)
    np.testing.assert_array_equal(c_jax, c_py)


def test_kcore_method():
    rng = np.random.default_rng(4)
    adj, nodes = planted_clique_graph(rng, n=50, k=7, p=0.08)
    found = maxclique.solve(adj, maxclique.Params(method=maxclique.Method.KCORE))
    # KCORE returns the max-core vertices: a superset containing the clique
    assert set(nodes).issubset(set(found))
    mask, maxcore = kcore.kcore_prune_mask(adj)
    assert sorted(np.flatnonzero(np.asarray(mask))) == found


def test_facade_solve_as_maximum_clique():
    """reference: src/clipper.cpp:82-97 semantics via the facade."""
    import sys
    sys.path.insert(0, "tests")
    from test_affinity import make_scene
    model, data = make_scene()
    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)
    soln = clipper.solve_as_maximum_clique()
    assert float(soln.score) == -1.0  # reference sets score = -1
    Ain = clipper.get_selected_associations()
    assert Ain.shape[0] == 3
    np.testing.assert_array_equal(Ain[:, 0], Ain[:, 1])
