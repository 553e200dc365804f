"""Flat (state-machine) solver vs nested solver parity tests.

The flattened batched engine must produce exactly the same iterates as the
nested reference-parity solver — same probes, same arithmetic, per lane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.solvers import msrc, msrc_flat

from test_affinity import make_scene


def random_graph(rng, m=32, density=0.4):
    W = rng.uniform(size=(m, m))
    keep = np.triu(rng.uniform(size=(m, m)) < density, 1)
    Mu_ = np.where(keep, np.triu((W + W.T) / 2, 1), 0.0)
    M = Mu_ + Mu_.T
    C = (M > 0).astype(np.float64)
    return M, C


def test_flat_matches_nested_random():
    rng = np.random.default_rng(0)
    for trial in range(4):
        M, C = random_graph(rng)
        u0 = rng.uniform(size=M.shape[0])
        u_n, F_n, i_n = jax.jit(
            lambda M, C, u0: msrc.find_dense_clique(M, C, u0, ct.Params(),
                                                    fuse_md=False))(
            jnp.asarray(M), jnp.asarray(C), jnp.asarray(u0))
        u_f, F_f, i_f = jax.jit(
            lambda M, C, u0: msrc_flat.flat_solve_single(
                msrc_flat.stacked_dual_matvec(M, C), u0, ct.Params()))(
            jnp.asarray(M), jnp.asarray(C), jnp.asarray(u0))
        np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_n),
                                   atol=1e-12, err_msg=f"trial {trial}")
        assert abs(float(F_f) - float(F_n)) < 1e-10
        assert int(i_f) == int(i_n)


def test_flat_matches_nested_scene():
    model, data = make_scene()
    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)
    M, C = clipper._M, clipper._C
    rng = np.random.default_rng(1)
    for _ in range(3):
        u0 = jnp.asarray(rng.uniform(size=M.shape[0]))
        u_n, F_n, i_n = msrc.find_dense_clique(M, C, u0, ct.Params(),
                                               fuse_md=False)
        u_f, F_f, i_f = msrc_flat.flat_solve_single(
            msrc_flat.stacked_dual_matvec(M, C), u0, ct.Params())
        np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_n),
                                   atol=1e-12)
        assert int(i_f) == int(i_n)


def test_flat_batched_matches_per_lane():
    rng = np.random.default_rng(2)
    B, m = 5, 24
    Ms, Cs, u0s = [], [], []
    for _ in range(B):
        M, C = random_graph(rng, m=m, density=0.35)
        Ms.append(M)
        Cs.append(C)
        u0s.append(rng.uniform(size=m))
    Ms, Cs, u0s = map(np.stack, (Ms, Cs, u0s))

    solns = jax.jit(lambda a, b, c: msrc_flat.solve_batched(
        a, b, c, ct.Params()))(jnp.asarray(Ms), jnp.asarray(Cs),
                               jnp.asarray(u0s))

    for b in range(B):
        u_n, F_n, i_n = msrc.find_dense_clique(
            jnp.asarray(Ms[b]), jnp.asarray(Cs[b]), jnp.asarray(u0s[b]),
            ct.Params(), fuse_md=False)
        np.testing.assert_allclose(np.asarray(solns.u[b]), np.asarray(u_n),
                                   atol=1e-12, err_msg=f"lane {b}")
        mask_n = np.asarray(msrc.round_solution(u_n, F_n))
        assert (np.asarray(solns.mask[b]) == mask_n).all()


@pytest.mark.parametrize("probes", [2, 4, 8])
def test_multiprobe_matches_single_probe(probes):
    """K-wide line search accepts exactly the same candidates as K=1.

    The accepted iterate sequence (and hence the final u, F, outer count)
    must match the sequential backtracking line search — multiprobe only
    changes how many candidates one matvec evaluates, not which is chosen.
    """
    rng = np.random.default_rng(3)
    saw_backtracks = False
    for trial in range(6):
        M, C = random_graph(rng, m=40, density=0.45)
        u0 = rng.uniform(size=M.shape[0])
        mv = msrc_flat.stacked_dual_matvec(jnp.asarray(M), jnp.asarray(C))
        u1, F1, i1, t1, nb1 = jax.jit(
            lambda u0: msrc_flat.flat_solve_single(
                mv, u0, ct.Params(), return_ticks=True))(jnp.asarray(u0))
        uK, FK, iK, tK, nbK = jax.jit(
            lambda u0: msrc_flat.flat_solve_single_multiprobe(
                mv, u0, ct.Params(), probes=probes,
                return_ticks=True))(jnp.asarray(u0))
        np.testing.assert_allclose(np.asarray(uK), np.asarray(u1),
                                   atol=1e-12, err_msg=f"trial {trial}")
        assert abs(float(FK) - float(F1)) < 1e-10
        assert int(iK) == int(i1)
        # identical candidate acceptance => identical total rejected probes
        assert int(nbK) == int(nb1), (trial, int(nbK), int(nb1))
        saw_backtracks |= int(nb1) > 0
        # every backtrack chain of length L now costs ceil(L/K) ticks
        assert int(tK) <= int(t1)
    assert saw_backtracks, "test corpus never exercised the line search"


@pytest.mark.parametrize("matvec", ["stacked", "stacked_bf16", "stacked_int8", "fused"])
def test_batched_pipeline_matvec_modes(matvec):
    """All matvec modes of the batched pipeline find the same cliques."""
    from clipper_tpu.parallel import batched

    rng = np.random.default_rng(9)
    B, n, ni, m = 3, 60, 20, 128
    D1s, D2s, As = [], [], []
    for _ in range(B):
        D1 = rng.uniform(size=(n, 3))
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D1s.append(D1); D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(B, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    pipe = batched.make_batched_pipeline(inv, ct.Params(), matvec=matvec)
    solns = pipe(jnp.asarray(np.stack(D1s), jnp.float32),
                 jnp.asarray(np.stack(D2s), jnp.float32),
                 jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    masks = np.asarray(solns.mask)
    for b in range(B):
        sel = set(np.flatnonzero(masks[b]))
        # DSD_HEU takes omega=round(F) largest entries: the weakest inlier or
        # two may be dropped (recall ~90% is the algorithm's operating point)
        assert len(sel & set(range(ni))) >= ni - 2, (matvec, b, sel)
        assert len(sel - set(range(ni))) <= 3, (matvec, b, sel)


@pytest.mark.parametrize("matvec", ["stacked", "stacked_bf16"])
def test_batched_pipeline_multiprobe(matvec):
    """probes>1 pipeline finds the same cliques as the single-probe one."""
    from clipper_tpu.parallel import batched

    rng = np.random.default_rng(11)
    B, n, ni, m = 3, 60, 20, 128
    D1s, D2s, As = [], [], []
    for _ in range(B):
        D1 = rng.uniform(size=(n, 3))
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D1s.append(D1); D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(B, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(np.stack(D1s), jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    ref = batched.make_batched_pipeline(inv, ct.Params(), matvec=matvec)(*args)
    mp = batched.make_batched_pipeline(inv, ct.Params(), matvec=matvec,
                                       probes=8)(*args)
    assert (np.asarray(mp.mask) == np.asarray(ref.mask)).all()
