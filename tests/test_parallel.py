"""Batched (vmap) and sharded (shard_map) engine tests on a virtual
8-device CPU mesh — capability the reference entirely lacks (SURVEY.md §2:
no DP/TP/multi-device of any kind)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import clipper_tpu as ct
from clipper_tpu import utils
from clipper_tpu.parallel import batched, sharded
from clipper_tpu.solvers.msrc import round_solution
from clipper_tpu.types import Params


def make_problem(rng, n=80, n_inliers=30, m=96):
    D1 = rng.uniform(size=(n, 3))
    th = rng.uniform(0, np.pi)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]])
    D2 = D1 @ R.T + rng.normal(0, 0.001, size=(n, 3))
    A = np.zeros((m, 2), dtype=np.int32)
    A[:n_inliers, 0] = A[:n_inliers, 1] = np.arange(n_inliers)
    A[n_inliers:, 0] = rng.integers(0, n, m - n_inliers)
    A[n_inliers:, 1] = rng.integers(0, n, m - n_inliers)
    return D1, D2, A


INV = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                      epsilon=0.05))


def dense_solve(D1, D2, A, u0):
    M, C = ct.score_pairwise_consistency(INV, jnp.asarray(D1),
                                         jnp.asarray(D2), jnp.asarray(A))
    u, F, i = ct.find_dense_clique(M, C, jnp.asarray(u0), ct.Params())
    return np.asarray(u), float(F), np.asarray(round_solution(u, F))


def test_batched_matches_sequential():
    rng = np.random.default_rng(0)
    B = 4
    problems = [make_problem(rng) for _ in range(B)]
    u0s = rng.uniform(size=(B, 96))

    pipe = batched.make_batched_pipeline(INV, ct.Params())
    solns = pipe(jnp.stack([jnp.asarray(p[0]) for p in problems]),
                 jnp.stack([jnp.asarray(p[1]) for p in problems]),
                 jnp.stack([jnp.asarray(p[2]) for p in problems]),
                 jnp.asarray(u0s))

    for b, (D1, D2, A) in enumerate(problems):
        u_ref, F_ref, mask_ref = dense_solve(D1, D2, A, u0s[b])
        np.testing.assert_allclose(np.asarray(solns.u[b]), u_ref, atol=1e-8)
        assert (np.asarray(solns.mask[b]) == mask_ref).all()


def test_batched_sharded_over_mesh():
    """Batch axis sharded over all 8 virtual devices (data parallelism)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(1)
    B = 8
    problems = [make_problem(rng) for _ in range(B)]
    u0s = rng.uniform(size=(B, 96))

    mesh = Mesh(np.array(jax.devices()), ("b",))
    args = (jnp.stack([jnp.asarray(p[0]) for p in problems]),
            jnp.stack([jnp.asarray(p[1]) for p in problems]),
            jnp.stack([jnp.asarray(p[2]) for p in problems]),
            jnp.asarray(u0s))
    args = batched.shard_batch(args, mesh)
    pipe = batched.make_batched_pipeline(INV, ct.Params())
    solns = pipe(*args)

    u_ref, F_ref, mask_ref = dense_solve(*problems[3], u0s[3])
    np.testing.assert_allclose(np.asarray(solns.u[3]), u_ref, atol=1e-8)


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (8, 1), (2, 2)])
def test_sharded_matches_dense(shape):
    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(2)
    D1, D2, A = make_problem(rng, m=96)
    u0 = rng.uniform(size=96)

    u_ref, F_ref, mask_ref = dense_solve(D1, D2, A, u0)

    mesh = sharded.make_mesh(shape)
    soln = sharded.solve_sharded(INV, D1, D2, A, u0, ct.Params(), mesh)
    np.testing.assert_allclose(np.asarray(soln.u), u_ref, atol=1e-8)
    assert abs(float(soln.score) - F_ref) < 1e-6
    assert (np.asarray(soln.mask) == mask_ref).all()


def test_sharded_padding_exactness():
    """m not divisible by the mesh: zero-padding must be exact."""
    rng = np.random.default_rng(3)
    D1, D2, A = make_problem(rng, m=91)  # 91 not divisible by 2 or 4
    u0 = rng.uniform(size=91)
    u_ref, F_ref, mask_ref = dense_solve(D1, D2, A, u0)

    mesh = sharded.make_mesh((2, 4))
    soln = sharded.solve_sharded(INV, D1, D2, A, u0, ct.Params(), mesh)
    assert soln.u.shape == (91,)
    np.testing.assert_allclose(np.asarray(soln.u), u_ref, atol=1e-8)
    assert (np.asarray(soln.mask) == mask_ref).all()


def test_sharded_affinity_blocks_match_dense():
    """The block-built M/C must tile exactly into the dense build."""
    rng = np.random.default_rng(4)
    D1, D2, A = make_problem(rng, m=96)
    M, C = ct.score_pairwise_consistency(INV, jnp.asarray(D1),
                                         jnp.asarray(D2), jnp.asarray(A))

    mesh = sharded.make_mesh((2, 4))
    P1 = jnp.asarray(D1)[A[:, 0]]
    P2 = jnp.asarray(D2)[A[:, 1]]

    def body(P1, P2, Aj):
        return sharded._affinity_block(INV, P1, P2, Aj, 96, 48, 24, 1e-4)

    blocks = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P()),
        out_specs=(P("r", "c"), P("r", "c")), check_vma=False))(
        P1, P2, jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(blocks[0]), np.asarray(M),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(blocks[1]), np.asarray(C),
                               atol=1e-12)


def test_sharded_pointnormal_matches_dense():
    """Sharded path with the 6-dof point-normal invariant (score_block)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from clipper_tpu.bench import harness
    rng = np.random.default_rng(5)
    D1, D2, A, Agt = harness.make_pointnormal_problem(rng, n=60, m=96,
                                                      rho=0.5, noise=0.002)
    inv = ct.PointNormalDistance(ct.PointNormalDistanceParams(
        sigp=0.03, epsp=0.06, sign=0.05, epsn=0.15))
    u0 = rng.uniform(size=96)

    M, C = ct.score_pairwise_consistency(inv, jnp.asarray(D1),
                                         jnp.asarray(D2), jnp.asarray(A))
    u_ref, F_ref, _ = ct.find_dense_clique(M, C, jnp.asarray(u0), ct.Params())

    mesh = sharded.make_mesh((2, 4))
    soln = sharded.solve_sharded(inv, D1, D2, A, u0, ct.Params(), mesh)
    np.testing.assert_allclose(np.asarray(soln.u), np.asarray(u_ref),
                               atol=1e-8)


@pytest.mark.parametrize("kw", [dict(solver="nested"),
                                dict(probes=8),
                                dict(storage_dtype=jnp.bfloat16),
                                dict(storage_dtype=jnp.int8)])
def test_sharded_flat_variants_match_dense(kw):
    """Flat sharded solver variants select the dense solution's inliers.

    probes=8 in f64 is exact-parity with probes=1 (identical accepted
    candidates); reduced block storage (bf16/int8) may differ in the last
    float places but must select the same clique on a clean scene.
    """
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(6)
    D1, D2, A = make_problem(rng, m=96)
    u0 = rng.uniform(size=96)
    u_ref, F_ref, mask_ref = dense_solve(D1, D2, A, u0)

    mesh = sharded.make_mesh((2, 4))
    soln = sharded.solve_sharded(INV, D1, D2, A, u0, ct.Params(), mesh, **kw)
    if not kw.get("storage_dtype"):
        assert (np.asarray(soln.mask) == mask_ref).all(), kw
        np.testing.assert_allclose(np.asarray(soln.u), u_ref, atol=1e-8)
        assert abs(float(soln.score) - F_ref) < 1e-6
    else:
        # reduced storage perturbs entries (bf16 ~0.4% rel, int8 ~0.4%
        # abs): on an m=96 toy scene this can wiggle the weakest members
        # of the clique — require near-identical selection and a polished
        # objective within a few percent (the m=1024 P/R gate is BENCH.md)
        a = set(np.flatnonzero(np.asarray(soln.mask)))
        b = set(np.flatnonzero(mask_ref))
        iou = len(a & b) / len(a | b)
        assert iou >= 0.85, (kw, sorted(a), sorted(b))
        assert abs(float(soln.score) - F_ref) / F_ref < 0.05, kw


@pytest.mark.parametrize("storage", ["int8", "bf16"])
def test_sharded_stored_build_bitmatches_plain_build(storage):
    """The chunked direct-to-storage block build (capacity path for m >= 65k)
    is bit-identical to quantizing the full-precision block build."""
    import jax.numpy as jnp
    from clipper_tpu.solvers import msrc_flat

    sdtype = {"int8": jnp.int8, "bf16": jnp.bfloat16}[storage]
    rng = np.random.default_rng(9)
    D1, D2, A = make_problem(rng)
    m = A.shape[0]
    mesh = sharded.make_mesh((2, 4))
    m_pad = sharded._padded_size(m, 2, 4)
    P1 = jnp.asarray(D1, jnp.float32)[A[:, 0]]
    P2 = jnp.asarray(D2, jnp.float32)[A[:, 1]]
    P1p, P2p, _ = sharded.pad_problem(P1, P2, jnp.zeros(m), m_pad)
    A_pad = jnp.pad(jnp.asarray(A), ((0, m_pad - m), (0, 0)),
                    constant_values=-1)
    mr, mc = m_pad // 2, m_pad // 4

    def plain(P1, P2, A, m_true):
        M_blk, C_blk = sharded._affinity_block(INV, P1, P2, A, m_true,
                                               mr, mc, 1e-4)
        MC = jnp.concatenate([M_blk, C_blk], axis=0)
        return (msrc_flat.quantize_stacked(MC) if sdtype == jnp.int8
                else MC.astype(sdtype))

    def chunked(P1, P2, A, m_true):
        return sharded._affinity_block_stored(INV, P1, P2, A, m_true, mr, mc,
                                              1e-4, sdtype, build_chunk=16)

    run = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P("r", "c"),
        check_vma=False))(P1p, P2p, A_pad, jnp.asarray(m, jnp.int32))
    a = np.asarray(run(plain), np.float32)
    b = np.asarray(run(chunked), np.float32)
    np.testing.assert_array_equal(a, b)


def test_sharded_int8_chunked_end_to_end():
    """Full sharded solve through the chunked int8 storage build + top-k
    support polish recovers the planted clique."""
    rng = np.random.default_rng(13)
    D1, D2, A = make_problem(rng, n_inliers=30)
    u0 = rng.uniform(size=96).astype(np.float32)
    mesh = sharded.make_mesh((2, 4))
    soln = sharded.solve_sharded(
        INV, jnp.asarray(D1, jnp.float32), jnp.asarray(D2, jnp.float32),
        jnp.asarray(A), jnp.asarray(u0), ct.Params(), mesh,
        storage_dtype=jnp.int8, probes=4, power_steps=2, build_chunk=16,
        support=64)
    sel = set(np.flatnonzero(np.asarray(soln.mask)))
    assert len(sel & set(range(30))) >= 26, sel
    assert len(sel - set(range(30))) <= 3, sel
    # the polished objective must be consistent with the clique size
    assert 20 <= float(soln.score) <= 35


def test_sharded_support_overflow_exact_fallback():
    """When the converged support exceeds the polish's top-k, the pipeline
    must fall back to the exact chunked block quadform: omega = round(F)
    would otherwise truncate the DSD_HEU mask to ~k entries (the bug class
    found at m=65536 on hardware: R collapsed to F/clique_size)."""
    rng = np.random.default_rng(21)
    D1, D2, A = make_problem(rng, n_inliers=30)
    u0 = rng.uniform(size=96).astype(np.float32)
    mesh = sharded.make_mesh((2, 4))
    soln = sharded.solve_sharded(
        INV, jnp.asarray(D1, jnp.float32), jnp.asarray(D2, jnp.float32),
        jnp.asarray(A), jnp.asarray(u0), ct.Params(), mesh,
        storage_dtype=jnp.int8, probes=4, power_steps=2, build_chunk=16,
        support=8)  # << clique size 30: fast path would give F ~ 2-4
    sel = set(np.flatnonzero(np.asarray(soln.mask)))
    assert len(sel & set(range(30))) >= 26, sel
    assert len(sel - set(range(30))) <= 3, sel
    assert 20 <= float(soln.score) <= 35


@pytest.mark.parametrize("storage", [None, jnp.bfloat16, jnp.int8])
def test_sharded_chunked_matvec_matches_unchunked(storage):
    """matvec_chunk slices rows before dequantizing (CPU-mesh memory cap);
    every output element's dot product reads identical data, so (Mu, Cu)
    must match the unchunked matvec exactly for f64/f32 storage and to
    float-associativity tolerance for reduced storage."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(11)
    D1, D2, A = make_problem(rng, m=96)
    u = jnp.asarray(rng.uniform(size=96))

    mesh = sharded.make_mesh((2, 4))
    m = 96
    mr, mc = m // 2, m // 4
    A_j = jnp.asarray(A, jnp.int32)
    P1 = jnp.asarray(D1)[A_j[:, 0]]
    P2 = jnp.asarray(D2)[A_j[:, 1]]

    def run(chunk):
        def body(P1, P2, A, u):
            MC = sharded._affinity_block_stored(
                INV, P1, P2, A, m, mr, mc, 1e-4,
                storage or P1.dtype, 32)
            mv = sharded.sharded_dual_matvec(MC, mr, mc, P1.dtype,
                                             matvec_chunk=chunk)
            return mv(u)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        return f(P1, P2, A_j, u)

    Mu0, Cu0 = run(None)
    Mu1, Cu1 = run(16)
    np.testing.assert_allclose(np.asarray(Mu1), np.asarray(Mu0),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Cu1), np.asarray(Cu0),
                               rtol=1e-6, atol=1e-8)


def test_make_mesh_multihost_shape_logic(monkeypatch):
    """make_mesh_multihost: rows = processes, cols = local devices, so the
    per-probe column psum rides ICI and only the row-axis all_gather
    crosses DCN (advertised in README; exercised here with mocked
    process/local-device topologies on the 8-device CPU mesh)."""
    from clipper_tpu.parallel import sharded

    # this host: 8 virtual devices, 1 process -> (1, 8)
    mesh = sharded.make_mesh_multihost()
    assert mesh.shape == {"r": 1, "c": 8}

    # mocked 2-host topology: 4 local devices each -> (2, 4), with each
    # mesh row holding one process's devices contiguously
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    mesh = sharded.make_mesh_multihost()
    assert mesh.shape == {"r": 2, "c": 4}
    devs = np.asarray(jax.devices()).reshape(2, 4)
    got = np.array([[d.id for d in row] for row in mesh.devices])
    want = np.array([[d.id for d in row] for row in devs])
    np.testing.assert_array_equal(got, want)

    # 8 single-device hosts -> (8, 1)
    monkeypatch.setattr(jax, "local_device_count", lambda: 1)
    assert sharded.make_mesh_multihost().shape == {"r": 8, "c": 1}


def test_sharded_engine_runs_on_multihost_mesh():
    """The dense-sharded pipeline executes on the make_mesh_multihost mesh
    (not just make_mesh) — the advertised README flow end-to-end."""
    from clipper_tpu.bench import data, harness
    from clipper_tpu.parallel import sharded

    rng = np.random.default_rng(11)
    pcd0 = harness.load_bunny().astype(np.float32)
    m = 512
    pcd1, A, Agt = harness.make_problem(pcd0, m, 0.9, rng)
    inv = harness.default_invariant()
    mesh = sharded.make_mesh_multihost()
    u0 = np.asarray(utils.randvec(jax.random.PRNGKey(0), m,
                                  dtype=jnp.float32))
    soln = sharded.solve_sharded(inv, jnp.asarray(pcd0), jnp.asarray(pcd1),
                                 jnp.asarray(A, jnp.int32), jnp.asarray(u0),
                                 Params(), mesh=mesh)
    p, r = data.get_precision_recall(A[np.asarray(soln.mask)], Agt)
    assert p > 0.97 and r > 0.8
