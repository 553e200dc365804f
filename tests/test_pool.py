"""Pool (lane-compaction) engine vs plain batched engine parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.parallel import batched, pool
from clipper_tpu.solvers import msrc, msrc_flat

from test_msrc_flat import random_graph


def _prepare(rng, W, m=24, density=0.35):
    Ms, Cs, u0s = [], [], []
    for _ in range(W):
        M, C = random_graph(rng, m=m, density=density)
        Ms.append(M)
        Cs.append(C)
        u0s.append(rng.uniform(size=m))
    Ms, Cs, u0s = map(lambda x: jnp.asarray(np.stack(x)), (Ms, Cs, u0s))
    MCs = jnp.concatenate([Ms, Cs], axis=1)
    inits = jax.vmap(
        lambda M, C, u0: msrc_flat.flat_init(
            msrc_flat.stacked_dual_matvec(M, C), u0, ct.Params()))(Ms, Cs, u0s)
    return Ms, Cs, u0s, MCs, inits


@pytest.mark.parametrize("W,lanes,window", [(7, 3, 4), (8, 8, 2),
                                            (5, 8, 4), (12, 4, 1)])
def test_pool_matches_flat_exactly(W, lanes, window):
    """Compacted scheduling must not change any lane's trajectory.

    The pool drives the identical tick function with frozen-lane masking,
    so in f64 the final u/F/ifinal must equal flat_solve_single bit-for-bit
    for every problem, for any lanes/window split of the workload
    (including W < lanes, W not divisible by lanes, window=1).
    """
    rng = np.random.default_rng(42 + W)
    Ms, Cs, u0s, MCs, inits = _prepare(rng, W)

    u_p, F_p, i_p = jax.jit(
        lambda MCs, inits: pool.solve_pool(MCs, inits, ct.Params(),
                                           lanes=lanes, window=window))(
        MCs, inits)

    for w in range(W):
        u_f, F_f, i_f = msrc_flat.flat_solve_single(
            msrc_flat.stacked_dual_matvec(Ms[w], Cs[w]), u0s[w], ct.Params())
        np.testing.assert_array_equal(np.asarray(u_p[w]), np.asarray(u_f),
                                      err_msg=f"problem {w}")
        assert float(F_p[w]) == float(F_f)
        assert int(i_p[w]) == int(i_f)


def test_pool_pipeline_matches_batched_masks():
    """End-to-end pool pipeline selects the same cliques as the batched one."""
    rng = np.random.default_rng(3)
    W, n, ni, m = 9, 60, 20, 128
    D1s, D2s, As = [], [], []
    D1 = rng.uniform(size=(n, 3))
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(W, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))

    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                 chunk=4)
    solns = pp(*args)
    assert solns.mask.shape == (W, m)

    ref = batched.make_batched_pipeline(inv, ct.Params(), shared_d1=True,
                                        matvec="stacked_bf16")(*args)
    for w in range(W):
        sel_p = np.flatnonzero(np.asarray(solns.mask[w]))
        sel_b = np.flatnonzero(np.asarray(ref.mask[w]))
        assert (sel_p == sel_b).all(), (w, sel_p, sel_b)
        # identical final iterates up to f32/bf16 scheduling noise
        ub, up = np.asarray(ref.u[w]), np.asarray(solns.u[w])
        corr = np.dot(ub, up) / (np.linalg.norm(ub) * np.linalg.norm(up))
        assert corr > 0.999, (w, corr)


@pytest.mark.parametrize("storage", [jnp.bfloat16, jnp.int8])
def test_pool_reduced_storage_registration(storage):
    """bf16/int8 pool storage recovers the inlier set on registration scenes.

    Quantized storage (int8: +-0.4% entry perturbation, entries < 1/254
    clipped to 0) may flip knife-edge line-search decisions and land in a
    nearby basin on adversarial random graphs, but on the registration
    workload the inlier clique dominates and the selected associations must
    match the full-precision engine's almost everywhere (TPU P/R is the
    end gate — see BENCH.md).
    """
    rng = np.random.default_rng(7)
    W, n, ni, m = 8, 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T + rng.normal(0, 0.003, size=(n, 3))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(W, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=5, window=4,
                                 storage_dtype=storage)
    solns = pp(*args)

    # the pool shares the tick/init functions with the batched engine, so
    # per-problem masks must agree exactly for the same storage dtype
    mv_mode = "stacked_bf16" if storage == jnp.bfloat16 else "stacked_int8"
    ref = batched.make_batched_pipeline(inv, ct.Params(), shared_d1=True,
                                        matvec=mv_mode)(*args)
    assert (np.asarray(solns.mask) == np.asarray(ref.mask)).all()

    # absolute quality gate on the bf16 path (the int8 path's quality is
    # gated on the real m=1024 workload — see BENCH.md: identical P/R; on
    # tiny m=128 scenes the +-0.4% quantization can flip the local basin)
    if storage == jnp.bfloat16:
        for w in range(W):
            sel = set(np.flatnonzero(np.asarray(solns.mask[w])))
            # R ~ 90% operating point: omega-rounding drops the weakest few
            # inliers under noise (reference ex4 prints the same recall band)
            assert len(sel & set(range(ni))) >= ni - 4, (w, sel)
            assert len(sel - set(range(ni))) <= 3, (w, sel)


def test_pool_multistart_best_of_k():
    """Best-of-K multistart dominates the single-init pipeline objective."""
    rng = np.random.default_rng(21)
    W, K, n, ni, m = 6, 3, 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T + rng.normal(0, 0.003, size=(n, 3))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(W, K, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    D1j = jnp.asarray(D1, jnp.float32)
    D2j = jnp.asarray(np.stack(D2s), jnp.float32)
    Aj = jnp.asarray(np.stack(As))
    u0j = jnp.asarray(u0s)

    ms = pool.make_pool_multistart_pipeline(inv, ct.Params(), restarts=K,
                                            lanes=5, window=4)
    best = ms(D1j, D2j, Aj, u0j)
    assert best.mask.shape == (W, m)
    assert best.u.shape == (W, m)

    # restart 0 alone = the plain pipeline; best-of-K must score >= it
    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=5, window=4)
    single = pp(D1j, D2j, Aj, u0j[:, 0])
    for w in range(W):
        assert float(best.score[w]) >= float(single.score[w]) - 1e-4, w
        sel = set(np.flatnonzero(np.asarray(best.mask[w])))
        assert len(sel & set(range(ni))) >= ni - 4, (w, sel)


def test_support_polish_matches_full_rebuild():
    """Top-k-restricted polish agrees with the full-affinity objective."""
    rng = np.random.default_rng(31)
    n, ni, m = 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    for trial in range(4):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T + rng.normal(0, 0.003, size=(n, 3))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        u0 = jnp.asarray(rng.uniform(size=m), jnp.float32)
        D1j = jnp.asarray(D1, jnp.float32)
        D2j = jnp.asarray(D2, jnp.float32)
        Aj = jnp.asarray(A)
        from clipper_tpu.ops.affinity import score_pairwise_consistency
        M, C = score_pairwise_consistency(inv, D1j, D2j, Aj)
        u, F, i = msrc_flat.flat_solve_single(
            msrc_flat.stacked_dual_matvec(M, C, jnp.bfloat16), u0,
            ct.Params())
        F_full = float(jnp.dot(u, M @ u + u))
        F_sup = float(pool.support_polish(inv, D1j, D2j, Aj, u, k=64))
        assert abs(F_sup - F_full) < 0.05, (trial, F_sup, F_full)
        # and with k >= nonzero support it is (near-)exact
        F_sup_big = float(pool.support_polish(inv, D1j, D2j, Aj, u, k=m))
        assert abs(F_sup_big - F_full) < 1e-3, (trial, F_sup_big, F_full)


def test_power_init_quality():
    """power_steps init keeps the selected cliques on registration scenes."""
    rng = np.random.default_rng(41)
    W, n, ni, m = 6, 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2s.append(D1 @ R.T + rng.normal(0, 0.003, size=(n, 3)))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        As.append(A)
    u0s = rng.uniform(size=(W, m)).astype(np.float32)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                 power_steps=4)
    solns = pp(*args)
    for w in range(W):
        sel = set(np.flatnonzero(np.asarray(solns.mask[w])))
        assert len(sel & set(range(ni))) >= ni - 4, (w, sel)
        assert len(sel - set(range(ni))) <= 3, (w, sel)


def test_pool_mesh_data_parallel_matches_single_device():
    """mesh= pool: per-device loops produce the identical per-problem masks."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(51)
    W, n, ni, m = 16, 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2s.append(D1 @ R.T + rng.normal(0, 0.003, size=(n, 3)))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        As.append(A)
    u0s = rng.uniform(size=(W, m)).astype(np.float32)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))

    single = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                     power_steps=2)(*args)
    mesh = Mesh(np.array(jax.devices()[:8]), ("b",))
    multi = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                    power_steps=2, mesh=mesh)(*args)
    assert (np.asarray(multi.mask) == np.asarray(single.mask)).all()
    np.testing.assert_allclose(np.asarray(multi.score),
                               np.asarray(single.score), rtol=1e-5)


def test_pool_pointnormal_invariant():
    """The pool engine is invariant-generic: point-normal scenes solve too."""
    from clipper_tpu.bench import harness

    rng = np.random.default_rng(61)
    D1s, D2s, As, Agts = [], [], [], []
    W = 4
    for s in range(W):
        D1, D2, A, Agt = harness.make_pointnormal_problem(
            rng, n=80, m=96, rho=0.7)
        D1s.append(D1); D2s.append(D2); As.append(A); Agts.append(Agt)
    inv = ct.PointNormalDistance()
    u0s = rng.uniform(size=(W, 96)).astype(np.float32)
    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=2, window=4,
                                 shared_d1=False)
    solns = pp(jnp.asarray(np.stack(D1s), jnp.float32),
               jnp.asarray(np.stack(D2s), jnp.float32),
               jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    from clipper_tpu.bench import data
    for w in range(W):
        mask = np.asarray(solns.mask[w])
        p, r = data.get_precision_recall(np.asarray(As[w])[mask], Agts[w])
        assert p >= 0.9 and r >= 0.6, (w, p, r)


def test_solve_pool_contract_requires_problem_of():
    """W inits over P != W matrices without a mapping must error, not
    silently clamp the matrix gather (advisor finding r1)."""
    rng = np.random.default_rng(5)
    m = 32
    MCs = jnp.asarray(rng.uniform(size=(2, 2 * m, m)), jnp.float32)
    mv = msrc_flat.make_stacked_matvec(MCs[0], jnp.float32)
    inits = jax.vmap(
        lambda u0: msrc_flat.flat_init(mv, u0, ct.Params()))(
        jnp.asarray(rng.uniform(size=(3, m)), jnp.float32))
    with pytest.raises(ValueError, match="problem_of"):
        pool.solve_pool(MCs, inits, ct.Params(), lanes=2, window=2)


def test_pool_multistart_support_polish_matches_full():
    """Multistart restart selection via top-k support polish picks the same
    winners/masks as the full (m, m) affinity rebuild."""
    rng = np.random.default_rng(77)
    W, K, n, ni, m = 4, 3, 60, 20, 128
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2s.append(D1 @ R.T + rng.normal(0, 0.003, size=(n, 3)))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        As.append(A)
    u0s = jnp.asarray(rng.uniform(size=(W, K, m)), jnp.float32)
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    D1j = jnp.asarray(D1, jnp.float32)
    D2j = jnp.asarray(np.stack(D2s), jnp.float32)
    Aj = jnp.asarray(np.stack(As))

    full = pool.make_pool_multistart_pipeline(
        inv, ct.Params(), restarts=K, lanes=4, window=4, support=None)
    sup = pool.make_pool_multistart_pipeline(
        inv, ct.Params(), restarts=K, lanes=4, window=4, support=64)
    s_full = full(D1j, D2j, Aj, u0s)
    s_sup = sup(D1j, D2j, Aj, u0s)
    np.testing.assert_array_equal(np.asarray(s_full.mask),
                                  np.asarray(s_sup.mask))
    np.testing.assert_allclose(np.asarray(s_full.score),
                               np.asarray(s_sup.score), atol=0.05)


def test_pool_dsd_rounding_downgrade_warns():
    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams())
    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pool.make_pool_pipeline(inv, ct.Params(rounding=ct.Rounding.DSD))
    assert any("DSD" in str(w.message) for w in rec)


def test_pool_support_bucket_covers_wide_cliques():
    """A clique wider than the polish's default top-k must not truncate
    omega = round(F): the pipeline re-buckets k to the observed support
    (the bug class found at m=65536 on hardware)."""
    rng = np.random.default_rng(17)
    W, n, ni, m = 4, 80, 60, 128   # clique 60 >> support 16
    D1 = rng.uniform(size=(n, 3))
    D2s, As = [], []
    for _ in range(W):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = D1 @ R.T + rng.normal(0, 0.001, size=(n, 3))
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        D2s.append(D2); As.append(A)
    u0s = rng.uniform(size=(W, m)).astype(np.float32)

    inv = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                          epsilon=0.05))
    args = (jnp.asarray(D1, jnp.float32),
            jnp.asarray(np.stack(D2s), jnp.float32),
            jnp.asarray(np.stack(As)), jnp.asarray(u0s))
    pp = pool.make_pool_pipeline(inv, ct.Params(), lanes=4, window=4,
                                 support=16)
    solns = pp(*args)
    for w in range(W):
        sel = set(np.flatnonzero(np.asarray(solns.mask[w])))
        assert len(sel & set(range(ni))) >= ni - 5, (w, len(sel))
        assert float(solns.score[w]) > ni * 0.8

    # multistart path: same re-bucketing
    K = 2
    u0K = rng.uniform(size=(W, K, m)).astype(np.float32)
    pm = pool.make_pool_multistart_pipeline(inv, ct.Params(), restarts=K,
                                            lanes=4, window=4, support=16)
    solns = pm(args[0], args[1], args[2], jnp.asarray(u0K))
    for w in range(W):
        sel = set(np.flatnonzero(np.asarray(solns.mask[w])))
        assert len(sel & set(range(ni))) >= ni - 5, (w, len(sel))
