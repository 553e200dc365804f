"""Jittable k-core decomposition by iterative peeling.

The reference's KCORE max-clique method keeps vertices whose core number
reaches the maximum core (reference: src/maxclique.cpp:89-100, via PMC).
Peeling is expressible on TPU as a while_loop over masked degree matvecs:
each iteration either removes all vertices with degree <= k or advances k,
so it terminates in at most 2n + max_degree iterations.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class _PeelState(NamedTuple):
    core: jnp.ndarray
    alive: jnp.ndarray
    k: jnp.ndarray


def core_numbers(adj: jnp.ndarray) -> jnp.ndarray:
    """Core number of every vertex. adj: (n, n) 0/1, diagonal ignored."""
    n = adj.shape[0]
    adj = (adj != 0) & ~jnp.eye(n, dtype=bool)
    adjf = adj.astype(jnp.float32)

    def cond(s: _PeelState):
        return jnp.any(s.alive)

    def body(s: _PeelState):
        deg = (adjf @ s.alive.astype(jnp.float32)).astype(jnp.int32)
        peel = s.alive & (deg <= s.k)
        any_peel = jnp.any(peel)
        core = jnp.where(peel, s.k, s.core)
        alive = s.alive & ~peel
        k = jnp.where(any_peel, s.k, s.k + 1)
        return _PeelState(core, alive, k)

    init = _PeelState(jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                      jnp.int32(0))
    s = jax.lax.while_loop(cond, body, init)
    return s.core


@jax.jit
def kcore_prune_mask(adj: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mask of vertices with core >= max core, max core). Jittable."""
    core = core_numbers(adj)
    maxcore = jnp.max(core)
    return core >= maxcore, maxcore
