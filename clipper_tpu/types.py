"""Core types for clipper_tpu.

Mirrors the parameter/solution surface of the reference implementation
(reference: include/clipper/clipper.h:27-73) but as JAX-friendly frozen
dataclasses and pytrees. Arrays are dense jnp arrays with static shapes:

- ``Association``: (m, 2) int32 array of putative association index pairs.
- Affinity/constraint matrices: dense (m, m) float arrays, zero diagonal,
  symmetric. The reference stores a sparse upper triangle
  (reference: src/clipper.cpp:61-64); on TPU a dense, masked representation
  maps directly onto the MXU and XLA's tiling, so we keep the full symmetric
  matrix and treat the implicit identity exactly as the reference solver does
  (reference: src/clipper.cpp:194,219).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Rounding(enum.IntEnum):
    """Rounding strategies for extracting an inlier set from the solved u.

    reference: include/clipper/clipper.h:50-59
    """

    NONZERO = 0
    DSD = 1
    DSD_HEU = 2


@dataclasses.dataclass(frozen=True)
class Params:
    """Core MSRC solver parameters (reference: include/clipper/clipper.h:27-60).

    Field names and defaults match the reference exactly for parity.
    """

    tol_u: float = 1e-8          # stop when change in u < tol
    tol_F: float = 1e-9          # stop when change in F < tol
    tol_Fop: float = 1e-10       # (kept for API parity; unused, as in reference)
    maxiniters: int = 200        # max gradient-ascent steps per d
    maxoliters: int = 1000       # max outer (homotopy) iterations
    beta: float = 0.25           # backtracking step-size reduction, in (0,1)
    maxlsiters: int = 99         # max line-search iterations per grad step
    eps: float = 1e-9            # numerical threshold around 0
    affinityeps: float = 1e-4    # sparsity-promoting threshold for affinities
    rescale_u0: bool = True      # rescale u0 with one power-iteration step
    rounding: Rounding = Rounding.DSD_HEU


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Solution:
    """Result of a dense-clique solve, as a pytree.

    The reference stores ``nodes`` as a dynamic-length vector
    (reference: include/clipper/clipper.h:65-73). With XLA static shapes we
    carry a fixed-size boolean ``mask`` over the m graph vertices plus the
    fields the reference exposes. ``nodes`` (int indices) are derived lazily
    on the host via :meth:`nodes`.
    """

    ifinal: jax.Array      # () int32 — number of outer iterations run
    mask: jax.Array        # (m,) bool — selected vertices (rounded solution)
    u0: jax.Array          # (m,) — initial iterate
    u: jax.Array           # (m,) — final characteristic vector
    score: jax.Array       # () — objective value F (est. largest eigenvalue)
    t: float = dataclasses.field(default=0.0, metadata=dict(static=False))

    @property
    def nodes(self) -> np.ndarray:
        """Indices of selected graph vertices (host-side, ascending)."""
        return np.flatnonzero(np.asarray(self.mask))


def as_association(A) -> jnp.ndarray:
    """Coerce to an (m, 2) int32 association array."""
    A = jnp.asarray(A, dtype=jnp.int32)
    if A.ndim != 2 or A.shape[1] != 2:
        raise ValueError(f"Association must be (m, 2); got {A.shape}")
    return A
