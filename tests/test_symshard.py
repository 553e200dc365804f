"""Triangle-sharded engine (symstore.solve_sharded_sym): the composition of
symmetric-tile storage with the device mesh — total [M; C] bytes m^2 + O(m t)
split evenly over D devices (vs 2 m^2 for parallel.sharded's dense stacked
blocks). Runs on the virtual 8-device CPU mesh; must reproduce the
single-device symstore pipeline on the same problem.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import clipper_tpu as ct
from clipper_tpu.ops import symstore

INV = ct.EuclideanDistance()


def make_problem(rng, n=128, n_inliers=40, m=100):
    D1 = rng.uniform(-1, 1, size=(n, 3))
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 2] *= -1
    D2 = D1 @ R.T + rng.normal(scale=0.002, size=(n, 3))
    A = np.stack([rng.permutation(n)[:m], rng.permutation(n)[:m]], axis=1)
    A[:n_inliers, 1] = A[:n_inliers, 0]
    return jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A, jnp.int32)


def test_shard_tile_coords_padding():
    nt, D = 4, 8
    rows, cols = symstore.shard_tile_coords(nt, D)
    T = nt * (nt + 1) // 2
    assert len(rows) % D == 0 and len(rows) >= T
    # real slots match the canonical ordering; padding is the inert (nt, nt)
    r0, c0 = symstore.tile_coords(nt)
    np.testing.assert_array_equal(rows[:T], r0)
    np.testing.assert_array_equal(cols[:T], c0)
    assert (rows[T:] == nt).all() and (cols[T:] == nt).all()


@pytest.mark.parametrize("storage", [jnp.int8, None])
def test_symshard_solve_matches_single_device(storage):
    """8-device triangle-sharded solve == single-device symstore solve.

    Same int8 tile contents on both paths; only the f32 accumulation order
    of the matvec differs (device-local partials + psum), so the solves may
    diverge in final bits — require matching inlier sets and objective.
    """
    rng = np.random.default_rng(3)
    m = 100
    D1, D2, A = make_problem(rng, n=120, n_inliers=40, m=m)
    u0 = jnp.asarray(rng.uniform(size=m), jnp.float32)
    D1f, D2f = D1.astype(jnp.float32), D2.astype(jnp.float32)
    sd = storage if storage is not None else jnp.float32

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    soln = symstore.solve_sharded_sym(
        INV, D1f, D2f, A, u0, ct.Params(), mesh, tile=32, storage_dtype=sd,
        power_steps=4, support=64, build_chunk=3, mv_chunk=2)
    assert soln.u.shape == (m,)

    u_s, F_s, _ = symstore.solve_single(
        INV, D1f, D2f, A, u0, ct.Params(), tile=32, storage_dtype=sd,
        power_steps=4, support=64, build_chunk=3, matvec="xla")
    from clipper_tpu.solvers import msrc
    mask_s = np.asarray(msrc.round_solution(
        u_s, F_s.astype(u_s.dtype), ct.Rounding.DSD_HEU))

    a = set(np.flatnonzero(np.asarray(soln.mask)))
    b = set(np.flatnonzero(mask_s))
    iou = len(a & b) / max(1, len(a | b))
    assert iou >= 0.9, (sorted(a), sorted(b))
    assert abs(float(soln.score) - float(F_s)) / max(1.0, float(F_s)) < 0.05
    assert len(a) > 0


def test_symshard_overflow_exact_polish():
    """A clique wider than ``support`` must take the exact partial-psum
    branch and still produce an accurate objective (omega = round(F))."""
    rng = np.random.default_rng(5)
    m, n_inliers = 96, 60
    D1, D2, A = make_problem(rng, n=120, n_inliers=n_inliers, m=m)
    u0 = jnp.asarray(rng.uniform(size=m), jnp.float32)
    D1f, D2f = D1.astype(jnp.float32), D2.astype(jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    soln = symstore.solve_sharded_sym(
        INV, D1f, D2f, A, u0, ct.Params(), mesh, tile=32,
        storage_dtype=jnp.int8, power_steps=4, support=8,  # force overflow
        build_chunk=3, mv_chunk=2)

    # exact objective from the dense full-precision rebuild
    from clipper_tpu.ops.affinity import score_pairwise_consistency
    M, _ = score_pairwise_consistency(INV, D1f, D2f, A, affinityeps=1e-4)
    u = np.asarray(soln.u, np.float64)
    F_ref = float(u @ (np.asarray(M, np.float64) @ u) + u @ u)
    assert abs(float(soln.score) - F_ref) < 0.2, (float(soln.score), F_ref)
    assert int(np.asarray(soln.mask).sum()) >= 0.8 * n_inliers


def test_symshard_pallas_rows_matches_xla_mode():
    """matvec='pallas' (row-chunked kernel per device + psum, interpret
    mode off-TPU) must agree with the XLA tile-list mode on the same
    problem — the production multi-chip TPU configuration."""
    rng = np.random.default_rng(9)
    m = 100
    D1, D2, A = make_problem(rng, n=120, n_inliers=40, m=m)
    u0 = jnp.asarray(rng.uniform(size=m), jnp.float32)
    D1f, D2f = D1.astype(jnp.float32), D2.astype(jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    kw = dict(tile=32, storage_dtype=jnp.int8, power_steps=4, support=64,
              build_chunk=3, mv_chunk=2)
    s_x = symstore.solve_sharded_sym(
        INV, D1f, D2f, A, u0, ct.Params(), mesh, matvec="xla", **kw)
    s_p = symstore.solve_sharded_sym(
        INV, D1f, D2f, A, u0, ct.Params(), mesh, matvec="pallas", G=2, **kw)

    a = set(np.flatnonzero(np.asarray(s_x.mask)))
    b = set(np.flatnonzero(np.asarray(s_p.mask)))
    iou = len(a & b) / max(1, len(a | b))
    assert iou >= 0.9, (sorted(a), sorted(b))
    assert len(b) > 0
    assert abs(float(s_p.score) - float(s_x.score)) / max(
        1.0, float(s_x.score)) < 0.05
