"""Successive dense-clique extraction for multi-object association.

The reference solves for ONE densest cluster per call (reference:
src/clipper.cpp:172-281 returns a single u / solution) and leaves
multi-object scenes — k rigid objects each moving with its own transform,
so the consistency graph is a disjoint union of k cliques — to the caller.
This module makes the peel loop a first-class, retrace-free primitive:
solve on the current subgraph, round, suppress the found support with a
keep mask applied INSIDE the dual matvec (the stored [M; C] is never
rewritten or re-uploaded), repeat.

TPU shape discipline: the jitted step is compiled once per (m, flags); the
host loop only flips entries of the (m,) keep mask and fetches a per-clique
scalar, so k-object extraction costs k solver runs on the SAME device-
resident storage — no rebuilds, no retraces, no O(m^2) host traffic.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clipper_tpu.solvers import msrc, msrc_flat
from clipper_tpu.types import Params, Rounding


class CliqueExtraction(NamedTuple):
    """One extracted cluster: bool mask (m,), objective F, solver iters."""
    mask: np.ndarray
    score: float
    ifinal: int


def masked_dual_matvec(mv, keep):
    """Wrap a dual matvec to operate on the keep-subgraph.

    Zeroing u's masked entries on the way in and (M u, C u)'s on the way
    out is exactly the solver on the vertex-induced subgraph: suppressed
    nodes see no edges and contribute none, the same inertness argument as
    the padding in parallel.sharded.pad_problem.
    """
    def mv_masked(u):
        k = keep[:, None] if u.ndim == 2 else keep
        Mu, Cu = mv(u * k)
        return Mu * k, Cu * k

    return mv_masked


def _polish_bucket(nnz: int, m: int) -> int:
    """Smallest power-of-2 top-k size covering the support (>= 64, <= m);
    keeps the number of distinct _support_quadform compilations log(m)."""
    k = 64
    while k < nnz:
        k *= 2
    return min(k, m)


@functools.partial(jax.jit, static_argnames=("k",))
def _support_quadform(Mf, u, keep, *, k: int):
    """Full-precision u'(M + I)u on u's top-k support, ON DEVICE.

    Mf is the original full-precision affinity, kept device-resident for
    the lifetime of the peel loop — the per-peel polish is an O(k m) gather
    plus an O(k^2) quadform, with no O(m^2) host transfer at any m. Exact
    whenever nnz(u) <= k (M is nonnegative with zero diagonal; entries
    beyond the support gather zero rows/values). Matches the pool
    pipelines' f32-polish contract: the in-loop quantized objective has a
    systematic positive bias (BENCH.md round 2), so omega rounding must use
    a full-precision objective.
    """
    dtype = Mf.dtype
    un = u.astype(dtype) * keep.astype(dtype)
    un = un / jnp.maximum(jnp.linalg.norm(un), jnp.asarray(1e-12, dtype))
    vals, idx = jax.lax.top_k(un, k)
    Mk = Mf[idx][:, idx]
    return vals @ (Mk @ vals) + 1.0  # + un'un of the unit iterate


@functools.partial(jax.jit, static_argnames=("params", "probes",
                                             "power_steps"))
def _extract_step(MC_store, keep, u0, *, params: Params, probes: int,
                  power_steps: int):
    """One peel: solve the keep-subgraph, return (u, F, ifinal)."""
    dtype = u0.dtype
    mv = masked_dual_matvec(msrc_flat.make_stacked_matvec(MC_store, dtype),
                            keep.astype(dtype))
    u0 = u0 * keep
    # renormalize so the init is a unit vector on the subgraph
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0), jnp.asarray(1e-12, dtype))
    if power_steps:
        u0 = msrc_flat.power_init(mv, u0, power_steps)
    if probes > 1:
        return msrc_flat.flat_solve_single_multiprobe(
            mv, u0, params, probes=probes)
    return msrc_flat.flat_solve_single(mv, u0, params)


def extract_cliques(M, C, key, params: Optional[Params] = None, *,
                    max_cliques: int = 8, min_size: int = 3,
                    probes: int = 8, power_steps: int = 4,
                    storage_dtype=jnp.int8,
                    dtype=jnp.float32) -> List[CliqueExtraction]:
    """Peel up to ``max_cliques`` dense clusters from a consistency graph.

    M, C: (m, m) affinity/constraint matrices (dense; device or host).
    key: PRNG key for the per-peel random inits.
    min_size: stop when the newest clique has fewer selected vertices.
    storage_dtype: int8 (default, quantized hot loop + f32 objective
        semantics identical to the pool engine), bf16, or None for f32.

    Returns cliques in extraction order (densest-first in practice). The
    returned masks are disjoint (each is intersected with the current
    peel's support, so a clique can never claim an already-extracted
    node). Quality contract: each peel is exactly one reference-semantics
    MSRC solve on the vertex-induced subgraph of the not-yet-extracted
    nodes, with omega rounding on a full-precision on-device objective.

    Rounding.DSD is remapped to DSD_HEU with a warning: the per-peel
    rounding is in-graph and exact DSD needs a host max-flow
    (reference: src/clipper.cpp:294-300); use the Clipper facade for
    exact DSD on a single cluster.
    """
    if params is None:
        params = Params()
    rounding = params.rounding
    if rounding == Rounding.DSD:
        import warnings
        warnings.warn(
            "extract_cliques cannot run exact (host-side) DSD rounding "
            "per peel; remapping to Rounding.DSD_HEU — use the Clipper "
            "facade for exact DSD", stacklevel=2)
        rounding = Rounding.DSD_HEU
    m = M.shape[0]
    # full-precision affinity stays DEVICE-resident for the per-peel
    # support polish (see _support_quadform) — no O(m^2) host traffic
    Mf = jnp.asarray(M, jnp.float32)
    MC = jnp.concatenate([Mf, jnp.asarray(C, jnp.float32)], axis=0)
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
        MC_store = msrc_flat.quantize_stacked(MC)
    elif storage_dtype is not None:
        MC_store = MC.astype(storage_dtype)
    else:
        MC_store = MC

    keep = jnp.ones(m, dtype)
    keep_np = np.ones(m, bool)
    out: List[CliqueExtraction] = []
    for _ in range(max_cliques):
        key, sub = jax.random.split(key)
        u0 = jax.random.uniform(sub, (m,), dtype,
                                minval=jnp.asarray(0.01, dtype),
                                maxval=jnp.asarray(1.0, dtype))
        u, F, ifinal = _extract_step(MC_store, keep, u0, params=params,
                                     probes=probes, power_steps=power_steps)
        u_np = np.asarray(u) * keep_np
        s = np.nonzero(u_np > 0)[0]
        if s.size < min_size:
            break
        k = _polish_bucket(s.size, m)
        Fp = float(_support_quadform(Mf, u, keep, k=k))
        mask_np = np.asarray(
            msrc.round_solution(jnp.asarray(u_np), jnp.asarray(Fp),
                                rounding))
        # clamp to the current support: omega = round(F) can exceed the
        # support size for arbitrary-weight M (entries > 1), where the
        # rounding's top-omega argsort would tie-break into zero-valued
        # (possibly already-extracted) vertices
        mask_np = mask_np & (u_np > 0)
        size = int(mask_np.sum())
        if size < min_size:
            break
        out.append(CliqueExtraction(mask=mask_np, score=Fp,
                                    ifinal=int(ifinal)))
        keep_np &= ~mask_np
        keep = jnp.asarray(keep_np, dtype)
    return out
