"""Successive clique extraction: multi-object peeling on one stored graph.

The reference returns a single densest cluster per solve; extract_cliques
peels k disjoint clusters from the same device-resident [M; C] storage with
a keep mask inside the matvec (solvers/extract.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

import clipper_tpu as ct
from clipper_tpu.solvers import extract

# planted-support assertions use NONZERO rounding: omega = round(u'(M+I)u)
# deliberately trims cliques whose edge weights are < 1 (reference
# semantics, src/clipper.cpp:302-309), while the converged SUPPORT is the
# full planted clique.
NZ = ct.Params(rounding=ct.Rounding.NONZERO)


def planted_graph(rng, m=256, cliques=((10, 0.95), (20, 0.9), (15, 0.85)),
                  noise_density=0.02):
    """Disjoint planted cliques + sparse random noise edges."""
    M = np.zeros((m, m))
    keep = np.triu(rng.uniform(size=(m, m)) < noise_density, 1)
    W = rng.uniform(0.1, 0.4, size=(m, m))
    Mu_ = np.where(keep, W, 0.0)
    M = Mu_ + Mu_.T
    nodes = rng.permutation(m)
    pos = 0
    planted = []
    for size, w in cliques:
        cl = np.sort(nodes[pos:pos + size])
        pos += size
        M[np.ix_(cl, cl)] = w
        planted.append(set(cl.tolist()))
    np.fill_diagonal(M, 0.0)
    C = (M > 0).astype(np.float64)
    return M, C, planted


def test_extracts_all_planted_cliques_f32():
    rng = np.random.default_rng(0)
    M, C, planted = planted_graph(rng)
    res = extract.extract_cliques(M, C, jax.random.PRNGKey(0), NZ,
                                  max_cliques=6, min_size=5,
                                  storage_dtype=None)
    found = [set(np.nonzero(r.mask)[0].tolist()) for r in res]
    # every planted clique recovered (exactly: planted weights dominate)
    for p in planted:
        assert any(f == p for f in found), (p, found)
    # masks are disjoint
    all_nodes = [i for f in found for i in f]
    assert len(all_nodes) == len(set(all_nodes))
    # extraction order is densest-first for the dominant cliques
    assert len(found[0]) == 20


def test_extracts_int8_storage_matches_f32_supports():
    rng = np.random.default_rng(1)
    M, C, planted = planted_graph(rng)
    res = extract.extract_cliques(M, C, jax.random.PRNGKey(3), NZ,
                                  max_cliques=6, min_size=5,
                                  storage_dtype=jnp.int8)
    found = [set(np.nonzero(r.mask)[0].tolist()) for r in res]
    for p in planted:
        assert any(f == p for f in found), (p, found)


def test_min_size_stops_extraction():
    rng = np.random.default_rng(2)
    M, C, planted = planted_graph(rng, cliques=((12, 0.95),),
                                  noise_density=0.0)
    res = extract.extract_cliques(M, C, jax.random.PRNGKey(1), NZ,
                                  max_cliques=8, min_size=5,
                                  storage_dtype=None)
    assert len(res) == 1
    assert set(np.nonzero(res[0].mask)[0].tolist()) == planted[0]
    assert res[0].score > 10.0  # u'(M+I)u of a 12-clique at w=0.95


def test_scores_monotone_nonincreasing_on_equal_weight_cliques():
    rng = np.random.default_rng(3)
    M, C, _ = planted_graph(rng, cliques=((24, 0.9), (12, 0.9)),
                            noise_density=0.0)
    res = extract.extract_cliques(M, C, jax.random.PRNGKey(2), NZ,
                                  max_cliques=4, min_size=3,
                                  storage_dtype=None)
    sizes = [int(r.mask.sum()) for r in res]
    assert sizes[0] >= sizes[1]
    assert res[0].score >= res[1].score


def test_dsd_rounding_remap_warns():
    import pytest
    rng = np.random.default_rng(5)
    M, C, _ = planted_graph(rng, m=64, cliques=((10, 0.9),),
                            noise_density=0.0)
    with pytest.warns(UserWarning, match="DSD"):
        extract.extract_cliques(M, C, jax.random.PRNGKey(0),
                                ct.Params(rounding=ct.Rounding.DSD),
                                max_cliques=1, min_size=3,
                                storage_dtype=None)


def test_mask_clamped_to_support_for_superunit_weights():
    # arbitrary-weight M with entries > 1: omega = round(u'(M+I)u) exceeds
    # the clique size, so without the support clamp the rounding would
    # select zero-valued (even already-extracted) vertices
    rng = np.random.default_rng(6)
    m = 96
    M = np.zeros((m, m))
    cl1 = np.arange(0, 10)
    cl2 = np.arange(20, 28)
    for cl, w in ((cl1, 3.0), (cl2, 2.5)):
        M[np.ix_(cl, cl)] = w
        np.fill_diagonal(M[np.ix_(cl, cl)], 0.0)
    C = (M > 0).astype(np.float64)
    res = extract.extract_cliques(M, C, jax.random.PRNGKey(4), NZ,
                                  max_cliques=4, min_size=3,
                                  storage_dtype=None)
    assert len(res) == 2
    found = [set(np.nonzero(r.mask)[0].tolist()) for r in res]
    assert found[0] == set(cl1.tolist())
    assert found[1] == set(cl2.tolist())
    all_nodes = [i for f in found for i in f]
    assert len(all_nodes) == len(set(all_nodes))
