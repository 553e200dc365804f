"""Solution checkpoint/resume.

The reference's nearest concept is warm-starting: solve(u0) accepts an
initial iterate and Solution retains u0/u (reference: include/clipper/clipper.h:102,70-71).
We keep warm-start as a feature and add explicit save/load so a long
screening pipeline can checkpoint solver state across preemptions.
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
