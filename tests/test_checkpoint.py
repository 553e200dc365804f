"""Solver-state checkpoint/resume (utils/checkpoint.py +
msrc_flat.flat_solve_ticks): a killed-and-resumed solve must reproduce the
uninterrupted trajectory bit-exactly in f64."""

import numpy as np

import jax
import jax.numpy as jnp

from clipper_tpu.bench import harness
from clipper_tpu.ops.affinity import score_pairwise_consistency
from clipper_tpu.solvers import msrc_flat
from clipper_tpu.types import Params
from clipper_tpu import utils
from clipper_tpu.utils import checkpoint


def _problem(m=200, rho=0.9, seed=0):
    rng = np.random.default_rng(seed)
    pcd0 = harness.load_bunny()
    pcd1, A, _ = harness.make_problem(pcd0, m, rho, rng)
    inv = harness.default_invariant()
    D1 = jnp.asarray(pcd0, jnp.float64)
    D2 = jnp.asarray(pcd1, jnp.float64)
    A = jnp.asarray(A, jnp.int32)
    M, C = score_pairwise_consistency(inv, D1, D2, A)
    return M, C


def test_kill_and_resume_bitexact_f64(tmp_path):
    M, C = _problem()
    m = M.shape[0]
    params = Params()
    u0 = utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float64)
    mv = msrc_flat.stacked_dual_matvec(M, C)

    # straight-through run
    u_ref, F_ref, i_ref, ticks_ref, _ = msrc_flat.flat_solve_single(
        mv, u0, params, return_ticks=True)

    # chunked run with a disk round-trip (the "preemption") every chunk
    state = msrc_flat.flat_init(mv, u0, params)
    path = tmp_path / "carry.npz"
    nchunks = 0
    while not bool(np.asarray(state.done)):
        state = msrc_flat.flat_solve_ticks(mv, state, params, ticks=7)
        checkpoint.save_solver_state(path, state)
        state = checkpoint.load_solver_state(path)
        nchunks += 1
        assert nchunks < 1000
    assert nchunks > 2   # the solve really was interrupted mid-flight
    assert state.u.dtype == jnp.float64

    np.testing.assert_array_equal(np.asarray(state.u), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(state.F), np.asarray(F_ref))
    assert int(state.i) == int(i_ref)
    assert int(state.ticks) == int(ticks_ref)


def test_batched_carry_roundtrip(tmp_path):
    """The carry may be batched (pool/sharded engines); dtypes and values
    survive the disk round-trip exactly."""
    M, C = _problem(m=128)
    params = Params()
    u0s = jax.vmap(lambda k: utils.randvec(k, 128, dtype=jnp.float64))(
        jax.random.split(jax.random.PRNGKey(1), 3))
    mv = msrc_flat.stacked_dual_matvec(M, C)
    states = jax.vmap(lambda u0: msrc_flat.flat_init(mv, u0, params))(u0s)
    path = tmp_path / "batch.npz"
    checkpoint.save_solver_state(path, states)
    back = checkpoint.load_solver_state(path)
    for a, b in zip(states, back):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
