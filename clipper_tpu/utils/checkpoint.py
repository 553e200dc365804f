"""Solution and solver-state checkpoint/resume.

The reference's nearest concept is warm-starting: solve(u0) accepts an
initial iterate and Solution retains u0/u (reference: include/clipper/clipper.h:102,70-71).
We keep warm-start as a feature and add explicit save/load so a long
screening pipeline can checkpoint solver state across preemptions.

Two levels:
  * Solution save/load — final results only. Re-solving from a saved
    Solution's u is a WARM START, not a resume: the homotopy penalty d and
    the line-search alpha are re-derived from u, so the continued
    trajectory differs from the uninterrupted one.
  * Solver-state save/load — the flat solver's full carry
    (msrc_flat._FlatState: u, gradF, F, d, alpha, loop counters). Drive a
    long solve in chunks with msrc_flat.flat_solve_ticks, checkpoint the
    carry between chunks, and a resume reproduces the uninterrupted
    trajectory BIT-EXACTLY (tests/test_checkpoint.py kills and resumes
    mid-solve in f64 and compares against the straight-through run).
    The carry may be batched (any leading axes) — pool/sharded engines
    carry the same pytree.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from clipper_tpu.types import Solution


def save_solution(path, soln: Solution) -> None:
    np.savez(path,
             ifinal=np.asarray(soln.ifinal),
             mask=np.asarray(soln.mask),
             u0=np.asarray(soln.u0),
             u=np.asarray(soln.u),
             score=np.asarray(soln.score),
             t=np.asarray(soln.t))


def load_solution(path) -> Solution:
    z = np.load(path)
    return Solution(ifinal=jnp.asarray(z["ifinal"]),
                    mask=jnp.asarray(z["mask"]),
                    u0=jnp.asarray(z["u0"]),
                    u=jnp.asarray(z["u"]),
                    score=jnp.asarray(z["score"]),
                    t=float(z["t"]))


def save_solver_state(path, state) -> None:
    """Checkpoint a flat-solver carry (msrc_flat._FlatState, possibly
    batched) to ``path`` (.npz). See module docstring for the resume
    contract."""
    np.savez(path, **{k: np.asarray(v)
                      for k, v in zip(state._fields, state)})


def load_solver_state(path):
    """Load a carry saved by :func:`save_solver_state`. Array dtypes are
    preserved exactly (the f64 bit-parity contract depends on it)."""
    from clipper_tpu.solvers.msrc_flat import _FlatState

    z = np.load(path)
    return _FlatState(**{k: jnp.asarray(z[k]) for k in _FlatState._fields})
