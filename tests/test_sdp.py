"""SDP relaxation (MSRC-SDR) tests.

The reference's SDP test is an unasserted smoke test
(reference: test/sdp_test.cpp:59-62). We go further: the toy-scene
get/set integration tests (reference: test/clipper_test.cpp:72-207 route
through solveAsMSRCSDR) must select the identity associations, and the
relaxation must agree with the PGA solver on planted-clique problems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.solvers import sdp

from test_affinity import make_scene
from test_dsd import golden_matrix


def test_sdr_toy_scene_get_set():
    """reference: test/clipper_test.cpp:72-134 (dense get/set + SDP)."""
    model, data = make_scene()
    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)

    M = clipper.get_affinity_matrix()
    C = clipper.get_constraint_matrix()

    clipper2 = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper2.set_matrix_data(M, C, A=clipper.get_initial_associations())
    clipper2.solve_as_msrc_sdr()

    Ain = clipper2.get_selected_associations()
    assert Ain.shape[0] == 3
    np.testing.assert_array_equal(Ain[:, 0], Ain[:, 1])


def test_sdr_sparse_get_set():
    """reference: test/clipper_test.cpp:138-207 (sparse get/set + SDP)."""
    import scipy.sparse as sp

    model, data = make_scene()
    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)
    M = np.asarray(clipper.get_affinity_matrix())
    C = np.asarray(clipper.get_constraint_matrix())
    Ms = sp.csr_matrix(np.triu(M, 1))
    Cs = sp.csr_matrix(np.triu(C, 1))

    clipper2 = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper2.set_sparse_matrix_data(Ms, Cs, A=clipper.get_initial_associations())
    clipper2.solve_as_msrc_sdr()

    Ain = clipper2.get_selected_associations()
    assert Ain.shape[0] == 3
    np.testing.assert_array_equal(Ain[:, 0], Ain[:, 1])


def test_sdr_smoke_20x20():
    """The reference's smoke matrix (reference: test/sdp_test.cpp:15-43),
    with real assertions: the SDR should pick the dense cluster that the
    DSD oracle identifies."""
    M = golden_matrix()
    C = (M > 0).astype(float)
    soln = sdp.solve(M, C)
    assert soln.iters > 0
    # X feasible: PSD-ish, unit trace, nonneg where allowed
    assert abs(np.trace(soln.X) - 1.0) < 1e-2
    assert soln.lambdas.min() > -1e-6
    # the selected nodes must form a feasible clique in C (every pair
    # connected) — the MSRC optimum here is the heavy triangle {8, 9, 16}
    # (w=2.79 incl. diagonal; the DSD densest subgraph {3,5,12,14,15} is NOT
    # a clique in C, so the zero-cone constraints exclude it)
    assert len(soln.nodes) >= 3
    for a in soln.nodes:
        for b in soln.nodes:
            assert C[a, b] != 0
    assert set(soln.nodes) == {8, 9, 16}
    # objective beats the rank-1 value of that clique: 1 + 2 w(S)/|S|
    w = sum(M[a, b] for a in soln.nodes for b in soln.nodes if a < b)
    assert soln.pobj >= 1 + 2 * w / 3 - 1e-2


def test_sdr_planted_clique():
    rng = np.random.default_rng(0)
    n = 40
    W = np.triu(rng.uniform(0, 0.2, size=(n, n)) *
                (rng.uniform(size=(n, n)) < 0.2), 1)
    clique = [4, 11, 19, 26, 33, 38]
    for a in range(len(clique)):
        for b in range(a + 1, len(clique)):
            W[clique[a], clique[b]] = 1.0
    M = W + W.T + np.eye(n)
    C = (M > 0).astype(float)
    soln = sdp.solve(M, C)
    assert set(soln.nodes) == set(clique)


def test_sdr_batched_matches_single():
    rng = np.random.default_rng(3)
    Ms, Cs = [], []
    for _ in range(3):
        n = 24
        W = np.triu(rng.uniform(0, 0.3, size=(n, n)) *
                    (rng.uniform(size=(n, n)) < 0.25), 1)
        clique = rng.choice(n, 5, replace=False)
        for a in range(5):
            for b in range(a + 1, 5):
                W[min(clique[a], clique[b]), max(clique[a], clique[b])] = 1.0
        M = W + W.T + np.eye(n)
        Ms.append(M)
        Cs.append((M > 0).astype(float))
    solns_b = sdp.solve_batched(np.stack(Ms), np.stack(Cs))
    for b in range(3):
        single = sdp.solve(Ms[b], Cs[b])
        assert set(solns_b[b].nodes) == set(single.nodes)


def test_sdr_certified_gap_oracle():
    """The reference's SDP test is unasserted (reference: test/sdp_test.cpp:59-62);
    we assert a certified optimality gap on the same 20x20 matrix: dobj is a
    true dual-feasible upper bound (repaired multipliers, see sdp.py), so
    |dobj - pobj| < 1e-3 certifies the solve."""
    M = golden_matrix()
    C = (M > 0).astype(float)
    p = sdp.Params(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)
    soln = sdp.solve(M, C, p)
    assert abs(soln.gap) < 1e-3, (soln.pobj, soln.dobj)
    assert soln.gap > -1e-8  # dobj is an upper bound (up to eigh rounding)
    assert set(soln.nodes) == {8, 9, 16}


def test_sdr_aa_and_adaptive_rho_match_plain():
    """Acceleration and rho adaptation are safeguarded: same fixed point,
    same node extraction, certified gap at least as small."""
    rng = np.random.default_rng(5)
    n = 32
    W = np.triu(rng.uniform(0, 0.3, size=(n, n)) *
                (rng.uniform(size=(n, n)) < 0.25), 1)
    clique = [2, 9, 17, 25, 30]
    for a in range(len(clique)):
        for b in range(a + 1, len(clique)):
            W[clique[a], clique[b]] = 1.0
    M = W + W.T + np.eye(n)
    C = (M > 0).astype(float)
    tight = dict(eps_abs=1e-6, eps_rel=1e-6, max_iters=20000)
    plain = sdp.solve(M, C, sdp.Params(acceleration_interval=0,
                                       adaptive_rho=False, **tight))
    accel = sdp.solve(M, C, sdp.Params(**tight))
    assert set(accel.nodes) == set(plain.nodes) == set(clique)
    assert abs(accel.pobj - plain.pobj) < 1e-4
    assert abs(accel.gap) < 1e-3


def test_sdr_chunked_driver_matches_oneshot():
    """verbose/time_limit uses the host-chunked driver — identical
    per-iteration arithmetic, so iters/pobj/dobj/nodes must match the
    one-shot jitted run exactly."""
    M = golden_matrix()
    C = (M > 0).astype(float)
    ref = sdp.solve(M, C)
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chk = sdp.solve(M, C, sdp.Params(verbose=True,
                                         time_limit_secs=3600.0))
    assert chk.iters == ref.iters
    assert chk.nodes == ref.nodes
    assert chk.pobj == pytest.approx(ref.pobj, abs=1e-12)
    assert chk.dobj == pytest.approx(ref.dobj, abs=1e-12)
    assert "r_prim" in buf.getvalue()


def test_sdr_time_limit_interrupts():
    """A zero-second budget must stop after the first chunk, far short of
    max_iters, and still return a usable (feasible) iterate."""
    M = golden_matrix()
    C = (M > 0).astype(float)
    full = sdp.solve(M, C, sdp.Params(eps_abs=1e-10, eps_rel=1e-10,
                                      max_iters=2000))
    lim = sdp.solve(M, C, sdp.Params(eps_abs=1e-10, eps_rel=1e-10,
                                     max_iters=2000, time_limit_secs=1e-9))
    assert lim.iters < full.iters
    assert lim.iters <= 60  # one chunk (interval*5 = 50) + slack
    assert abs(np.trace(lim.X) - 1.0) < 1e-6  # still spectrahedron-feasible


def test_sdr_lowrank_zstep_matches_full():
    """z_rank > 0 (subspace-iteration spectrahedron projection — the
    large-m route) must recover the same planted clique as the exact eigh
    Z-step, with a comparably certified gap."""
    rng = np.random.default_rng(0)
    n = 40
    W = np.triu(rng.uniform(0, 0.2, size=(n, n)) *
                (rng.uniform(size=(n, n)) < 0.2), 1)
    clique = [4, 11, 19, 26, 33, 38]
    for a in range(len(clique)):
        for b in range(a + 1, len(clique)):
            W[clique[a], clique[b]] = 1.0
    M = W + W.T + np.eye(n)
    C = (M > 0).astype(float)
    full = sdp.solve(M, C)
    low = sdp.solve(M, C, sdp.Params(z_rank=8))
    assert set(low.nodes) == set(clique) == set(full.nodes)
    assert low.gap <= max(2 * abs(full.gap), 0.1)


def test_facade_sdr_batched():
    import clipper_tpu as ct
    rng = np.random.default_rng(3)
    Ms, Cs = [], []
    for _ in range(2):
        n = 24
        W = np.triu(rng.uniform(0, 0.3, size=(n, n)) *
                    (rng.uniform(size=(n, n)) < 0.25), 1)
        clique = rng.choice(n, 5, replace=False)
        for a in range(5):
            for b in range(a + 1, 5):
                W[min(clique[a], clique[b]),
                  max(clique[a], clique[b])] = 1.0
        M = W + W.T + np.eye(n)
        Ms.append(M)
        Cs.append((M > 0).astype(float))
    solns = ct.Clipper.solve_as_msrc_sdr_batched(np.stack(Ms), np.stack(Cs))
    for b in range(2):
        single = sdp.solve(Ms[b], Cs[b])
        assert set(solns[b].nodes) == set(single.nodes)


def test_auto_tune_param_resolution():
    """auto_tune de-arms the documented scale foot-guns (BENCH.md r4):
    eps tightened at n >= 2048, z_rank auto-selected, AA disabled when its
    history exceeds the memory budget — each with a warning."""
    import warnings as w

    p = sdp.Params()
    # small n: untouched, no warnings
    with w.catch_warnings():
        w.simplefilter("error")
        assert sdp._resolve_params(p, 512, 4) == p
    # n = 2048: eps tightens + z_rank switches
    with pytest.warns(UserWarning, match="eps tightened"):
        with pytest.warns(UserWarning, match="z_rank"):
            r = sdp._resolve_params(p, 2048, 4)
    assert r.eps_abs == pytest.approx(1e-4)
    assert r.eps_rel == pytest.approx(1e-4)
    assert r.z_rank == 64
    # n = 8192: AA history (2*10*2*n^2*4 = 10.7 GB) exceeds the 2 GiB budget
    with pytest.warns(UserWarning, match="Anderson"):
        r = sdp._resolve_params(p, 8192, 4)
    assert r.acceleration_interval == 0
    # explicit opt-outs respected
    p2 = sdp.Params(auto_tune=False)
    with w.catch_warnings():
        w.simplefilter("error")
        assert sdp._resolve_params(p2, 8192, 4) == p2
    p3 = sdp.Params(z_rank=-1, eps_abs=1e-4, eps_rel=1e-4)
    r3 = sdp._resolve_params(p3, 4096, 4)
    assert r3.z_rank == -1   # -1 pins the exact eigh through auto_tune


def test_underconvergence_warning_fires_and_clears():
    """A starved solve (max_iters=2) must warn that extraction is
    unreliable; a converged solve must not."""
    rng = np.random.default_rng(7)
    n = 24
    W = np.triu(rng.uniform(0, 0.3, size=(n, n)) *
                (rng.uniform(size=(n, n)) < 0.25), 1)
    clique = [2, 5, 11, 17, 20]
    for a in range(len(clique)):
        for b in range(a + 1, len(clique)):
            W[clique[a], clique[b]] = 1.0
    M = W + W.T + np.eye(n)
    C = (M > 0).astype(float)
    with pytest.warns(UserWarning, match="under-converged"):
        sdp.solve(M, C, sdp.Params(max_iters=2))
    import warnings as w
    with w.catch_warnings():
        w.simplefilter("error")
        soln = sdp.solve(M, C)
    assert set(soln.nodes) == set(clique)
