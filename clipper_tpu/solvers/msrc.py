"""Core MSRC solver: graduated projected gradient ascent ("find dense clique").

Implements exactly the algorithm of the reference
(reference: src/clipper.cpp:172-323, the cleanest spec is matlab/clipper.m):

  * One power-iteration rescale of u0 with the implicit identity diagonal:
    u = (M + I) u0, normalized (reference: src/clipper.cpp:193-198).
  * Homotopy (outer) loop on the penalty d; the complement-graph term
    Cb = 11' - C - I is never materialized (reference: src/clipper.cpp:202):
        Cb u = 1 * sum(u) - C u - u
  * Gradient with implicit identity (reference: src/clipper.cpp:219):
        grad F = (1 + d) u - d 1 sum(u) + M u + d C u
  * Inner projected-gradient-ascent loop with backtracking line search
    (reference: src/clipper.cpp:226-261): alpha starts at 1, shrinks by beta
    while the objective decreases by more than eps.
  * d update: masked mean of |(M u + u)_i / (Cb u)_i| over indices where both
    Cb u and u exceed eps (reference: src/clipper.cpp:268-276); terminate the
    homotopy when no constraint is active.
  * Rounding (reference: src/clipper.cpp:287-310): NONZERO keeps u > 0;
    DSD_HEU takes the round(F) largest entries of u; DSD (host-side, opt-in)
    runs the exact densest-subgraph solver on the NONZERO support.

TPU-native structure: triple-nested ``lax.while_loop`` over dense (m, m)
matrices. The hot op is the fused matvec (M + d C + (1 + d) I - d 11') u —
per outer iteration we precompute Md = M + d C once so each line-search probe
costs ONE matvec instead of two (identical arithmetic up to float
reassociation; set ``fuse_md=False`` for the reference's exact operation
order). Everything is jittable and vmap-safe; per-problem early exit under
vmap is handled by the loop predicates.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from clipper_tpu.types import Params, Rounding, Solution


class _LSState(NamedTuple):
    k: jnp.ndarray
    alpha: jnp.ndarray
    unew: jnp.ndarray
    gradFnew: jnp.ndarray
    Fnew: jnp.ndarray
    deltaF: jnp.ndarray
    done: jnp.ndarray


class _InnerState(NamedTuple):
    j: jnp.ndarray
    u: jnp.ndarray
    gradF: jnp.ndarray
    F: jnp.ndarray
    converged: jnp.ndarray


class _OuterState(NamedTuple):
    i: jnp.ndarray
    u: jnp.ndarray
    d: jnp.ndarray
    F: jnp.ndarray
    done: jnp.ndarray
    stall: jnp.ndarray   # consecutive frozen-u outer transitions


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(cnt, 1)


# Dtype-aware numerical thresholds.
#
# The reference hardcodes eps = 1e-9 "to replace 0 with 100x machine epsilon"
# (reference: matlab/clipper.m:58, clipper.h:40) — calibrated for double
# precision. Run naively in f32, entries of Cb u that should be exactly zero
# carry ~1e-6 rounding noise, pass the 1e-9 activity test, and the d-update
# ratio Mu/Cbu with a noise denominator explodes the penalty — collapsing the
# solve. We therefore floor every threshold at 100x the dtype's machine
# epsilon times the quantity's scale. In f64 the floor is ~1e-14 and the
# reference values dominate: bit-exact parity. In f32 the floors take over
# and both correctness and convergence speed are restored.
_EPS_FACTOR = 100.0


def _eps_like(params_eps, scale, dtype):
    mach = jnp.finfo(dtype).eps
    return jnp.maximum(jnp.asarray(params_eps, dtype),
                       (_EPS_FACTOR * mach) * scale)


# Constraint-activity threshold for the homotopy d-update. The d increment is
# mean((M u + u)_i / (Cb u)_i) over "active" entries — a violation with
# Cb u ~ k * macheps * sum(u) produces a d step of order 1/(k * macheps),
# and penalizing it requires computing d * Cbu to absolute accuracy BETTER
# than macheps * sum(u) * d — i.e. beyond the dtype's resolution. Measured in
# f32 on the benchmark protocol: genuine residual violations at ~50 x macheps
# slip past the 100 x floor, blow d up to ~1e4+, and the amplified gradient /
# objective noise corrupts the lane (F > m, recall drops). Entries below
# ~2000 x macheps * sum(u) are numerically indistinguishable from "satisfied"
# at working precision, so the homotopy treats them as such; DSD_HEU rounding
# absorbs the sub-resolution stragglers. In f64 this floor (~4e-13 * sum(u))
# stays far below the reference's 1e-9, preserving bit parity.
_ACTIVITY_FACTOR = 2000.0


def _eps_active(params_eps, scale, dtype):
    mach = jnp.finfo(dtype).eps
    return jnp.maximum(jnp.asarray(params_eps, dtype),
                       (_ACTIVITY_FACTOR * mach) * scale)


# Stalled-homotopy guard (reduced-precision modes only). Late in a solve the
# penalty d can grow past the dtype's ability to MEASURE the objective: the
# noise of re-evaluating d * u'(Cb u) across matvecs exceeds the line-search
# tolerance, every honest step reads as a decrease, and the only "accepted"
# candidates are backtracked to numerical freezing — so u stops moving while
# the outer loop keeps bumping d (measured on TPU f32: lanes spin to
# maxoliters=1000 at ~24 probes per outer). When the inner loop converges
# immediately (no accepted step moved u by more than tol_u) for this many
# CONSECUTIVE outer transitions, the iterate is converged at working
# precision and the lane terminates. Disabled in f64, where the reference's
# exact semantics (grind until the penalty tips a gradient sign) are kept.
_STALL_OUTERS = 3


def _stall_guard_enabled(dtype) -> bool:
    return jnp.dtype(dtype) != jnp.dtype(jnp.float64)


class PGAOperators(NamedTuple):
    """Pluggable linear operators for the PGA loop.

    Lets the identical loop run on a local dense matrix, a vmapped batch, or
    a block-sharded distributed matrix (matvecs with psum/all_gather inside
    shard_map) without duplicating the algorithm.
    """

    mv_M: Callable       # u -> M @ u
    mv_C: Callable       # u -> C @ u
    make_mv_Md: Callable  # d -> (u -> (M + d C) @ u), may precompute Md


def dense_operators(M: jnp.ndarray, C: jnp.ndarray,
                    fuse_md: bool = True) -> PGAOperators:
    if fuse_md:
        def make(d):
            Md = M + d * C
            return lambda u: Md @ u
    else:
        def make(d):
            # reference: src/clipper.cpp:219 operation order (2 matvecs)
            return lambda u: M @ u + (C @ u) * d
    return PGAOperators(mv_M=lambda u: M @ u, mv_C=lambda u: C @ u,
                        make_mv_Md=make)


def find_dense_clique(
    M: jnp.ndarray,
    C: jnp.ndarray,
    u0: jnp.ndarray,
    params: Params = Params(),
    *,
    fuse_md: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run graduated projected gradient ascent.

    Args:
        M: (m, m) symmetric affinity, zero diagonal (implicit identity).
        C: (m, m) symmetric 0/1 constraints, zero diagonal (implicit identity).
        u0: (m,) nonnegative initial iterate.
        params: solver parameters.
        fuse_md: precompute Md = M + d*C once per outer iteration (1 matvec
            per line-search probe instead of 2).

    Returns:
        (u, F, ifinal): final characteristic vector, objective value, and
        outer-iteration count (matching reference Solution.ifinal semantics).
    """
    return run_pga(dense_operators(M, C, fuse_md), u0, params,
                   dtype=M.dtype)


def run_pga(ops: PGAOperators, u0: jnp.ndarray, params: Params,
            *, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The PGA + homotopy loop over abstract matvec operators."""
    dtype = dtype or u0.dtype
    u0 = u0.astype(dtype)
    eps = jnp.asarray(params.eps, dtype)

    def grad_fn(u, d, mv_Md):
        return (1.0 + d) * u - d * jnp.sum(u) + mv_Md(u)

    # ---- initialization (reference: src/clipper.cpp:193-209) ----
    if params.rescale_u0:
        u = ops.mv_M(u0) + u0
    else:
        u = u0
    u = u / jnp.linalg.norm(u)

    def compute_d_terms(u):
        su = jnp.sum(u)
        Cbu = su - ops.mv_C(u) - u
        eps_d = _eps_active(params.eps, su, dtype)
        idxD = (Cbu > eps_d) & (u > eps)
        Mu = ops.mv_M(u) + u
        ratio = Mu / jnp.where(idxD, Cbu, 1.0)
        return Cbu, idxD, ratio

    _, idxD0, ratio0 = compute_d_terms(u)
    d0 = jnp.where(jnp.any(idxD0), _masked_mean(ratio0, idxD0), 0.0).astype(dtype)

    # ---- line search (reference: src/clipper.cpp:234-252) ----
    def line_search(u, gradF, F, d, mv_Md):
        def cond(s: _LSState):
            return (~s.done) & (s.k < params.maxlsiters)

        def body(s: _LSState):
            unew = u + s.alpha * gradF                  # gradient step
            unew = jnp.maximum(unew, 0.0)               # project onto orthant
            unew = unew / jnp.linalg.norm(unew)         # project onto sphere
            gradFnew = grad_fn(unew, d, mv_Md)
            Fnew = jnp.dot(unew, gradFnew)
            deltaF = Fnew - F
            backtrack = deltaF < -_eps_like(params.eps, jnp.abs(F), dtype)
            return _LSState(s.k + 1,
                            jnp.where(backtrack, s.alpha * params.beta, s.alpha),
                            unew, gradFnew, Fnew, deltaF, ~backtrack)

        init = _LSState(jnp.int32(0), jnp.asarray(1.0, dtype),
                        u, gradF, F, jnp.asarray(0.0, dtype),
                        jnp.asarray(False))
        s = jax.lax.while_loop(cond, body, init)
        return s.unew, s.gradFnew, s.Fnew, s.deltaF

    # ---- inner PGA loop (reference: src/clipper.cpp:226-261) ----
    def inner_loop(u, gradF, F, d, mv_Md):
        def cond(s: _InnerState):
            return (~s.converged) & (s.j < params.maxiniters)

        def body(s: _InnerState):
            unew, gradFnew, Fnew, deltaF = line_search(s.u, s.gradF, s.F, d,
                                                       mv_Md)
            deltau = jnp.linalg.norm(unew - s.u)
            tol_u = _eps_like(params.tol_u, 1.0, dtype)   # ||u|| = 1
            tol_F = _eps_like(params.tol_F, jnp.abs(Fnew), dtype)
            converged = (deltau < tol_u) | (jnp.abs(deltaF) < tol_F)
            return _InnerState(s.j + 1, unew, gradFnew, Fnew, converged)

        init = _InnerState(jnp.int32(0), u, gradF, F, jnp.asarray(False))
        s = jax.lax.while_loop(cond, body, init)
        # frozen: converged on the very first step without moving u — the
        # stalled-homotopy signature (see _STALL_OUTERS)
        tol_u = _eps_like(params.tol_u, 1.0, dtype)
        frozen = (s.j <= 1) & (jnp.linalg.norm(s.u - u) < tol_u)
        return s.u, s.F, frozen

    # ---- outer homotopy loop (reference: src/clipper.cpp:218-281) ----
    stall_guard = _stall_guard_enabled(dtype)

    def outer_cond(s: _OuterState):
        return (~s.done) & (s.i < params.maxoliters)

    def outer_body(s: _OuterState):
        mv_Md = ops.make_mv_Md(s.d)
        gradF = grad_fn(s.u, s.d, mv_Md)
        F = jnp.dot(s.u, gradF)
        u, F, frozen = inner_loop(s.u, gradF, F, s.d, mv_Md)

        _, idxD, ratio = compute_d_terms(u)
        active = jnp.any(idxD)
        deltad = _masked_mean(jnp.abs(ratio), idxD)
        d = jnp.where(active, s.d + deltad, s.d)
        # ifinal semantics: the reference's `break` leaves i at the index of
        # the terminating iteration (reference: src/clipper.cpp:278-280,318).
        i = jnp.where(active, s.i + 1, s.i)
        stall = jnp.where(frozen, s.stall + 1, 0)
        done = ~active
        if stall_guard:
            done = done | (stall >= _STALL_OUTERS)
        return _OuterState(i, u, d, F, done, stall)

    init = _OuterState(jnp.int32(0), u, d0, jnp.asarray(0.0, dtype),
                       jnp.asarray(False), jnp.int32(0))
    s = jax.lax.while_loop(outer_cond, outer_body, init)
    return s.u, s.F, s.i


def round_solution(u: jnp.ndarray, F: jnp.ndarray,
                   rounding: Rounding = Rounding.DSD_HEU) -> jnp.ndarray:
    """Jittable rounding: (m,) bool mask of selected vertices.

    NONZERO (reference: src/clipper.cpp:290-292) and DSD_HEU
    (reference: src/clipper.cpp:302-309). DSD rounding requires the host-side
    exact densest-subgraph solver; see clipper_tpu.solvers.dsd.
    """
    if rounding == Rounding.NONZERO:
        return u > 0.0
    if rounding == Rounding.DSD_HEU:
        # omega = round(F): std::round rounds half away from zero; F >= 0 here
        omega = jnp.floor(F + 0.5).astype(jnp.int32)
        m = u.shape[0]
        order = jnp.argsort(-u)  # descending
        ranks = jnp.zeros(m, dtype=jnp.int32).at[order].set(
            jnp.arange(m, dtype=jnp.int32))
        return ranks < omega
    raise ValueError(f"rounding {rounding} not supported inside jit; "
                     "use Clipper facade for DSD rounding")


@functools.partial(jax.jit, static_argnames=("params", "fuse_md"))
def solve_msrc(
    M: jnp.ndarray,
    C: jnp.ndarray,
    u0: jnp.ndarray,
    params: Params = Params(),
    *,
    fuse_md: bool = True,
) -> Solution:
    """Full jitted solve: PGA + in-graph rounding (NONZERO / DSD_HEU)."""
    u, F, ifinal = find_dense_clique(M, C, u0, params, fuse_md=fuse_md)
    rounding = params.rounding
    if rounding == Rounding.DSD:
        # DSD rounding happens on host; inside jit fall back to NONZERO mask
        # (the facade reruns DSD on the support).
        rounding = Rounding.NONZERO
    mask = round_solution(u, F, rounding)
    return Solution(ifinal=ifinal, mask=mask, u0=u0, u=u, score=F)
