"""Flat row-major triangle pool storage (ops/flattri.py).

Oracles: the dense stacked matvec (msrc_flat.make_stacked_matvec) on the
same matrix content, and the per-lane flat tick (bit-exact scheduler
equivalence of the batched driver).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipper_tpu.bench import data, harness
from clipper_tpu.ops import flattri
from clipper_tpu.parallel import pool
from clipper_tpu.solvers import msrc_flat
from clipper_tpu.types import Params
from clipper_tpu import utils


def _random_stacked(rng, m, density=0.3, dtype=np.float64):
    M = rng.random((m, m)).astype(dtype)
    M = np.triu(M, 1)
    M[M < 1.0 - density] = 0.0
    M = M + M.T
    C = (M > 0).astype(dtype)
    return np.concatenate([M, C], axis=0)


def test_repack_matvec_matches_stacked_f64():
    rng = np.random.default_rng(0)
    t, nt = 128, 4
    m = t * nt
    P, B = 3, 5
    MCs = jnp.asarray(np.stack([_random_stacked(rng, m) for _ in range(P)]))
    tri = jnp.stack([flattri.repack_stacked(MCs[p], t) for p in range(P)])
    assert tri.shape == (P, 2 * t, flattri.tri_ncols(nt, t))
    idx = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    U = jnp.asarray(rng.random((B, m)))
    refM, refC = [], []
    for b, i in enumerate(np.asarray(idx)):
        mu, cu = msrc_flat.make_stacked_matvec(MCs[i], jnp.float64)(U[b])
        refM.append(np.asarray(mu))
        refC.append(np.asarray(cu))
    for maker in (flattri.make_tri_pool_matvec_xla,
                  flattri.make_tri_pool_matvec):
        MU, CU = maker(tri, nt, jnp.float64)(idx, U)
        np.testing.assert_allclose(np.asarray(MU), np.stack(refM),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(CU), np.stack(refC),
                                   rtol=0, atol=1e-12)


def test_tri_matvec_int8_matches_stacked():
    rng = np.random.default_rng(1)
    t, nt = 128, 2
    m = t * nt
    MC = _random_stacked(rng, m, dtype=np.float32)
    MC[:m] /= max(1.0, MC[:m].max())
    MC8 = msrc_flat.quantize_stacked(jnp.asarray(MC))
    tri = flattri.repack_stacked(MC8, t)[None]
    U = jnp.asarray(rng.random((3, m)), jnp.float32)
    idx = jnp.zeros(3, jnp.int32)
    ref = msrc_flat.make_stacked_matvec(MC8, jnp.float32)
    refM = np.stack([np.asarray(ref(U[b])[0]) for b in range(3)])
    for maker in (flattri.make_tri_pool_matvec_xla,
                  flattri.make_tri_pool_matvec):
        MU, _ = maker(tri, nt, jnp.float32)(idx, U)
        np.testing.assert_allclose(np.asarray(MU), refM, rtol=0, atol=1e-4)


def test_build_tri_pallas_bitexact_vs_xla():
    rng = np.random.default_rng(2)
    m, t = 256, 128
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, _ = harness.make_problem(pcd0, m, 0.9, rng)
    inv = harness.default_invariant()
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2 = jnp.asarray(pcd1, jnp.float32)
    A = jnp.asarray(A, jnp.int32)
    trix = flattri.build_tri_xla(inv, D1, D2, A, m, t=t)
    P1 = D1[A[:, 0]]
    P2 = D2[A[:, 1]]
    trip = flattri.build_tri_pallas(inv, P1[None], P2[None], A[None],
                                    jnp.asarray([m]), t=t)
    np.testing.assert_array_equal(np.asarray(trix), np.asarray(trip[0]))


def test_batched_tick_driver_bitexact_vs_vmapped():
    """make_flat_tick_batched == vmap(make_flat_tick) given agreeing
    matvecs — the scheduler-equivalence guarantee the tri pool rests on."""
    rng = np.random.default_rng(3)
    m, B = 256, 4
    params = Params()
    MCs = jnp.asarray(np.stack([_random_stacked(rng, m) for _ in range(B)]))
    u0s = jnp.asarray(rng.random((B, m)))

    def lane_mv(i):
        return msrc_flat.make_stacked_matvec(MCs[i], jnp.float64)

    def bmv(idx, U):
        MU, CU = jax.vmap(lambda i, u: lane_mv(i)(u))(idx, U)
        return MU, CU

    idx = jnp.arange(B, dtype=jnp.int32)
    inits_v = jax.vmap(lambda i, u0: msrc_flat.flat_init(
        lane_mv(i), u0, params))(idx, u0s)
    inits_b = msrc_flat.flat_init_batched(bmv, idx, u0s, params)
    for a, b in zip(inits_v, inits_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    vtick = jax.vmap(lambda i, s: msrc_flat.make_flat_tick(
        lane_mv(i), params, jnp.float64)(s))
    btick = msrc_flat.make_flat_tick_batched(bmv, params, jnp.float64)
    sv, sb = inits_v, inits_b
    for _ in range(5):
        sv = vtick(idx, sv)
        sb = btick(idx, sb)
        for a, b in zip(sv, sb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pool_tri_pipeline_matches_stacked():
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    B, m, rho = 6, 256, 0.9
    problems = [harness.make_problem(pcd0, m, rho, rng) for _ in range(B)]
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
        jax.random.split(key, B))
    inv = harness.default_invariant()
    out = {}
    for layout in ("stacked", "tri"):
        pipe = pool.make_pool_pipeline(inv, Params(), lanes=4, window=6,
                                       storage_dtype=jnp.int8,
                                       power_steps=2, layout=layout)
        s = pipe(D1, D2s, As, u0s)
        masks = np.asarray(s.mask)
        ps, rs = [], []
        for b, (_, A, Agt) in enumerate(problems):
            p, r = data.get_precision_recall(np.asarray(As[b])[masks[b]],
                                             Agt)
            ps.append(p)
            rs.append(r)
        out[layout] = (np.mean(ps), np.mean(rs))
    # same registration quality through either storage layout
    assert abs(out["tri"][0] - out["stacked"][0]) < 0.02
    assert abs(out["tri"][1] - out["stacked"][1]) < 0.02
    assert out["tri"][0] > 0.97 and out["tri"][1] > 0.8


def test_pool_tri_rejects_bad_m():
    inv = harness.default_invariant()
    pipe = pool.make_pool_pipeline(inv, Params(), layout="tri",
                                   storage_dtype=jnp.int8)
    D1 = jnp.zeros((10, 3), jnp.float32)
    D2s = jnp.zeros((2, 10, 3), jnp.float32)
    As = jnp.zeros((2, 100, 2), jnp.int32)   # m=100 not 128-divisible
    u0s = jnp.ones((2, 100), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        pipe(D1, D2s, As, u0s)


def test_pool_tri_multiprobe_matches_quality():
    """probes>1 (the K-wide in-tick line search) and d_scale keep the
    engine's registration quality (CPU XLA fallback path)."""
    rng = np.random.default_rng(5)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    B, m, rho = 6, 256, 0.9
    problems = [harness.make_problem(pcd0, m, rho, rng) for _ in range(B)]
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
        jax.random.split(key, B))
    inv = harness.default_invariant()
    pipe = pool.make_pool_pipeline(inv, Params(), lanes=4, window=2,
                                   storage_dtype=jnp.int8, power_steps=4,
                                   layout="tri", tri_probes=8,
                                   d_scale=0.15)
    s = pipe(D1, D2s, As, u0s)
    masks = np.asarray(s.mask)
    ps, rs = [], []
    for b, (_, A, Agt) in enumerate(problems):
        p, r = data.get_precision_recall(np.asarray(As[b])[masks[b]], Agt)
        ps.append(p)
        rs.append(r)
    assert np.mean(ps) > 0.97 and np.mean(rs) > 0.8


def test_multiprobe_candidates_match_sequential():
    """One multiprobe tick's chosen candidate equals K sequential ticks'
    final accepted state when all but the last probe reject — the
    semantics contract of the K-wide line search (f64, CPU)."""
    rng = np.random.default_rng(6)
    m = 128
    params = Params()
    MC = jnp.asarray(_random_stacked(rng, m))
    mv = msrc_flat.make_stacked_matvec(MC, jnp.float64)

    def bmv(idx, U):
        del idx
        if U.ndim == 3:
            MU, CU = jax.vmap(lambda row: jax.vmap(mv)(row))(U)
            return MU, CU
        return jax.vmap(mv)(U)

    u0 = utils.randvec(jax.random.PRNGKey(1), m, dtype=jnp.float64)
    init = msrc_flat.flat_init(mv, u0, params)
    binit = jax.tree.map(lambda a: a[None], init)
    idx = jnp.zeros(1, jnp.int32)

    K = 4
    btick_mp = msrc_flat.make_flat_tick_multiprobe_batched(
        bmv, params, jnp.float64, probes=K)
    tick_seq = msrc_flat.make_flat_tick(mv, params, jnp.float64)

    s_mp = btick_mp(idx, binit)
    s_seq = init
    # advance the sequential path until it either accepts or has burned
    # the same K probes the multiprobe tick evaluated
    for _ in range(K):
        prev_lsk = int(s_seq.lsk)
        s_seq = tick_seq(s_seq)
        if int(s_seq.lsk) == 0:      # accepted
            break
    np.testing.assert_allclose(np.asarray(s_mp.u[0]), np.asarray(s_seq.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(s_mp.F[0]), float(s_seq.F),
                               rtol=0, atol=1e-12)
    assert int(s_mp.d.shape[0]) == 1


def test_pool_tri_mesh_matches_quality():
    """layout='tri' under a data-parallel mesh: per-device build +
    compaction loop in one shard_map, no collectives."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    B, m = 16, 256
    problems = [harness.make_problem(pcd0, m, 0.9, rng) for _ in range(B)]
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
        jax.random.split(key, B))
    inv = harness.default_invariant()
    mesh = Mesh(np.array(jax.devices()), ("b",))
    pipe = pool.make_pool_pipeline(inv, Params(), lanes=2, window=2,
                                   storage_dtype=jnp.int8, power_steps=4,
                                   layout="tri", tri_probes=8,
                                   d_scale=0.15, mesh=mesh)
    s = pipe(D1, D2s, As, u0s)
    masks = np.asarray(s.mask)
    ps, rs = [], []
    for b, (_, A, Agt) in enumerate(problems):
        p, r = data.get_precision_recall(np.asarray(As[b])[masks[b]], Agt)
        ps.append(p)
        rs.append(r)
    assert np.mean(ps) > 0.97 and np.mean(rs) > 0.8


def test_build_tri_pallas_fused_bitexact():
    """The one-program-per-problem build variant is bit-identical to the
    per-tile grid build (kept as a documented wash — see BENCH.md r5)."""
    rng = np.random.default_rng(8)
    m, t = 256, 128
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, _ = harness.make_problem(pcd0, m, 0.9, rng)
    inv = harness.default_invariant()
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2 = jnp.asarray(pcd1, jnp.float32)
    A = jnp.asarray(A, jnp.int32)
    P1 = D1[A[:, 0]]
    P2 = D2[A[:, 1]]
    a = flattri.build_tri_pallas(inv, P1[None], P2[None], A[None],
                                 jnp.asarray([m]), t=t)
    b = flattri.build_tri_pallas_fused(inv, P1[None], P2[None], A[None],
                                       jnp.asarray([m]), t=t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_major_layout_matches_stacked_f64():
    """repack_stacked_tiles + the tile-major matvecs agree with the
    stacked oracle (the Pallas 'tiles' kernel is experimental on real
    TPUs — see its warning — but its math and the XLA fallback are
    exact)."""
    rng = np.random.default_rng(9)
    t, nt = 128, 4
    m = t * nt
    MC = jnp.asarray(_random_stacked(rng, m))
    tri = flattri.repack_stacked_tiles(MC, t)[None]
    U = jnp.asarray(rng.random((3, m)))
    idx = jnp.zeros(3, jnp.int32)
    ref = msrc_flat.make_stacked_matvec(MC, jnp.float64)
    refM = np.stack([np.asarray(ref(U[b])[0]) for b in range(3)])
    refC = np.stack([np.asarray(ref(U[b])[1]) for b in range(3)])
    for maker in (flattri.make_tri_pool_matvec_tiles_xla,
                  flattri.make_tri_pool_matvec_tiles):
        MU, CU = maker(tri, nt, jnp.float64)(idx, U)
        np.testing.assert_allclose(np.asarray(MU), refM, rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(CU), refC, rtol=0, atol=1e-12)
