"""Flattened MSRC solver: a per-lane state machine for efficient batching.

The reference algorithm is a triple-nested loop (outer homotopy / inner
ascent / backtracking line search — reference: src/clipper.cpp:218-281).
vmapping that nest directly is catastrophic for batches: each lax.while_loop
level runs until the LAST lane finishes, so lanes pay the max-of-products of
iteration counts across the batch.

This module flattens the nest into a single while_loop where one tick equals
one line-search probe (the unit of work: one dual matvec M u, C u). Every
lane carries its own (outer i, inner j, line-search k, alpha, d) state and
transitions independently:

    tick:  unew = P(u + alpha * gradF)          [project + normalize]
           (Mu, Cu) = dual_matvec(unew)          <-- ALL the O(m^2) work
           gradFnew, Fnew from (Mu, Cu)          [reference: clipper.cpp:238-242]
           backtrack?   -> alpha *= beta         [clipper.cpp:246-248]
           accept?      -> u, gradF, F update; inner step  [clipper.cpp:253-258]
           inner done?  -> d update from the SAME (Mu, Cu); refresh gradF/F
                           for the new d with no extra matvec [clipper.cpp:268-276,219]

Total ticks = max over lanes of that lane's own probe count — the SIMD
optimum. Per-lane arithmetic is identical to the reference loop (validated
tick-for-tick against the nested solver in tests).

The dual matvec is pluggable: the default stacks [M; C] into one batched
matmul; a fused Pallas kernel (ops/fused_matvec.py) computes both from ONE
read of M when C is the 0/1 pattern of M — half the HBM traffic of the
stacked form.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from clipper_tpu.solvers import msrc
from clipper_tpu.types import Params, Rounding, Solution


class _FlatState(NamedTuple):
    u: jnp.ndarray        # (m,) accepted iterate
    gradF: jnp.ndarray    # (m,) gradient at u for current d
    F: jnp.ndarray        # () objective at u
    d: jnp.ndarray        # () homotopy penalty
    alpha: jnp.ndarray    # () line-search step size
    lsk: jnp.ndarray      # () line-search iteration k
    j: jnp.ndarray        # () inner iteration count
    i: jnp.ndarray        # () outer iteration count
    done: jnp.ndarray     # () lane finished
    stall: jnp.ndarray    # () consecutive frozen-u outer transitions
    ticks: jnp.ndarray    # () diagnostic probe count
    nback: jnp.ndarray    # () diagnostic backtrack (rejected-probe) count


def _grad_from_mv(u, d, Mu, Cu):
    """gradF = (M + I) u - d Cb u with Cb u = 1 sum(u) - C u - u.

    Algebraically identical to the reference's expanded form
    (1 + d) u - d 1 sum(u) + M u + d C u (reference: src/clipper.cpp:219),
    but numerically far better when the homotopy penalty d is large: the
    expanded form sums intermediates at scale d * sum(u) that cancel to an
    O(1) result — in f32 a late-stage d ~ 1e4 (a genuine reference-semantics
    step when only tiny violations remain) turns that cancellation into
    catastrophic gradient noise and the solve collapses. Here every
    intermediate is at the scale of its contribution: (M u + u) ~ O(F) and
    d * Cbu ~ O(penalty), with Cbu's own cancellation happening BEFORE the
    multiplication by d.
    """
    return (Mu + u) - d * (jnp.sum(u) - Cu - u)


def _d_terms(u, Mu, Cu, params, dtype):
    """Activity mask and d-update ratios (reference: clipper.cpp:202-209)."""
    eps = jnp.asarray(params.eps, dtype)
    su = jnp.sum(u)
    Cbu = su - Cu - u
    # dtype-aware activity threshold (see msrc._eps_active)
    eps_d = msrc._eps_active(params.eps, su, dtype)
    idxD = (Cbu > eps_d) & (u > eps)
    num = Mu + u
    ratio = num / jnp.where(idxD, Cbu, 1.0)
    return idxD, ratio


def power_init(dual_matvec, u0, steps: int):
    """Extra power-iteration steps v <- normalize((M + I) v) on u0.

    The reference's init is ONE such step (rescale_u0,
    reference: src/clipper.cpp:193-198); a few more before handing u0 to
    the solver concentrate the iterate on the dominant cluster and all but
    eliminate the line-search backtracking tail (measured at m=1024 /
    90% outliers, steps=4: max batch ticks 132 -> 37, p99 100 -> 34,
    identical P/R; each step costs exactly one matvec tick). steps=0 is
    the reference trajectory. Since solve(u0) accepts any u0
    (reference: include/clipper/clipper.h:102), this is an init strategy,
    not a semantics change.
    """
    def pw(_, v):
        Mv, _ = dual_matvec(v)
        v = Mv + v
        return v / jnp.linalg.norm(v)

    return jax.lax.fori_loop(0, steps, pw, u0)


def flat_init(dual_matvec, u0, params: Params = Params()) -> _FlatState:
    """Initial per-lane state (reference: clipper.cpp:193-209).

    Shared by the while_loop driver (:func:`flat_solve_single`) and the
    pool scheduler (clipper_tpu.parallel.pool) so both run the identical
    trajectory.
    """
    dtype = u0.dtype
    Mu0, _ = dual_matvec(u0)
    u = _init_rescale(u0, Mu0, params)
    Mu, Cu = dual_matvec(u)
    return _init_from_mv(u, Mu, Cu, params, dtype)


def _init_rescale(u0, Mu0, params: Params):
    """The init's one power step (reference: clipper.cpp:193-198)."""
    u = Mu0 + u0 if params.rescale_u0 else u0
    return u / jnp.linalg.norm(u)


def _init_from_mv(u, Mu, Cu, params: Params, dtype) -> _FlatState:
    """Initial state from the rescaled iterate's matvec (see flat_init)."""
    idxD, ratio = _d_terms(u, Mu, Cu, params, dtype)
    d0 = jnp.where(jnp.any(idxD), msrc._masked_mean(ratio, idxD), 0.0)
    d0 = d0.astype(dtype)
    gradF0 = _grad_from_mv(u, d0, Mu, Cu)
    F0 = jnp.dot(u, gradF0)
    return _FlatState(u=u, gradF=gradF0, F=F0, d=d0,
                      alpha=jnp.asarray(1.0, dtype),
                      lsk=jnp.int32(0), j=jnp.int32(0), i=jnp.int32(0),
                      done=jnp.asarray(False), stall=jnp.int32(0),
                      ticks=jnp.int32(0), nback=jnp.int32(0))


def power_init_batched(batch_dual, idx, U0, steps: int):
    """Batched :func:`power_init`: one batched matvec per step.

    batch_dual(idx, U) -> (MU, CU) over (B, m) candidate rows; the per-lane
    arithmetic is vmapped, so lanes match power_init bit-for-bit whenever
    the matvecs agree.
    """
    def pw(_, V):
        MV, _ = batch_dual(idx, V)
        return jax.vmap(lambda mv, v: (mv + v) / jnp.linalg.norm(mv + v))(
            MV, V)

    return jax.lax.fori_loop(0, steps, pw, U0)


def flat_init_batched(batch_dual, idx, U0,
                      params: Params = Params()) -> _FlatState:
    """Batched :func:`flat_init` over a shared batched dual matvec.

    Returns a (B, ...) batched _FlatState identical to
    vmap(flat_init)(...) when the matvecs agree.
    """
    dtype = U0.dtype
    MU0, _ = batch_dual(idx, U0)
    U = jax.vmap(functools.partial(_init_rescale, params=params))(U0, MU0)
    MU, CU = batch_dual(idx, U)
    return jax.vmap(
        lambda u, mu, cu: _init_from_mv(u, mu, cu, params, dtype))(U, MU, CU)


def make_flat_tick_batched(batch_dual, params: Params, dtype,
                           ls_slack: float = 0.0,
                           warm_alpha: bool = False,
                           stall_outers: int = 0,
                           d_scale: float = 1.0):
    """Batched :func:`make_flat_tick`: (idx, states) -> states.

    All lanes' probe candidates are computed (vmapped :func:`_tick_probe`),
    ONE batched dual matvec evaluates them, and the per-lane updates are
    vmapped :func:`_tick_update` — the driver for batched matvecs that must
    run as a single kernel over all lanes (the flat-triangle pool engine,
    ops/flattri.py) instead of a per-lane closure. ls_slack: see
    :func:`_tick_update`.
    """
    def body(idx, ls: _FlatState) -> _FlatState:
        U = jax.vmap(_tick_probe)(ls)
        MU, CU = batch_dual(idx, U)
        return jax.vmap(
            lambda s, un, mu, cu: _tick_update(s, un, mu, cu, params,
                                               dtype, ls_slack,
                                               warm_alpha, stall_outers,
                                               d_scale))(ls, U, MU, CU)

    return body


def _tick_probe(s: _FlatState) -> jnp.ndarray:
    """The tick's projected candidate (reference: clipper.cpp:235-237).

    Split out of :func:`make_flat_tick` so batched drivers can compute ALL
    lanes' candidates, run ONE batched dual matvec over them, and hand the
    results to :func:`_tick_update` — per-lane arithmetic is the identical
    op sequence, so a batched tick matches vmap(make_flat_tick) bit-for-bit
    whenever the matvecs agree.
    """
    unew = jnp.maximum(s.u + s.alpha * s.gradF, 0.0)
    return unew / jnp.linalg.norm(unew)


def _tick_update(s: _FlatState, unew, Mu, Cu, params: Params,
                 dtype, ls_slack: float = 0.0,
                 warm_alpha: bool = False,
                 stall_outers: int = 0,
                 d_scale: float = 1.0) -> _FlatState:
    """Everything after the tick's matvec (see :func:`make_flat_tick`).

    ls_slack: optional relative line-search slack — the accept test becomes
    deltaF >= -max(eps_ls, ls_slack * |F|). Rationale (measured, round 5):
    XLA's batched int8/bf16 GEMV accumulates with ~|F| * 4e-4 noise and a
    negative bias on TPU, which silently behaved as exactly such a slack in
    the quantized pool engines — their measured speed (nback ~ 0) depends
    on it. An EXACT matvec (the flat-triangle Pallas kernel, f32-true
    accumulation) honestly rejects the same tiny decreases and backtracks
    4-5x more for identical final masks. The slack makes the tolerance
    explicit and controlled instead of an accident of GEMV lowering; the
    quantized storage already perturbs the objective by O(|F|/254), so
    accepting decreases below that resolution loses nothing. Default 0.0 =
    strict reference semantics (f64 bit parity untouched).

    warm_alpha: carry the line-search step size across accepted steps
    (alpha <- min(1, accepted / beta): retry one notch above what last
    worked) instead of the reference's alpha = 1 reset at every inner
    iteration (reference: src/clipper.cpp:227). At a large homotopy
    penalty d the stable step is ~1/d, so each reference inner iteration
    rediscovers it with ~log_beta(1/d) rejected probes — the measured
    mid-rho backtracking tail (BENCH.md r4: slowest lanes 130-151
    backtracks). Like power_init, an opt-in iteration strategy, not a
    semantics change (default False keeps reference trajectories and f64
    bit parity).
    """
    stall_guard = msrc._stall_guard_enabled(dtype)
    stall_outers = stall_outers or msrc._STALL_OUTERS
    one = jnp.asarray(1.0, dtype)

    def d_terms(u, Mu, Cu):
        return _d_terms(u, Mu, Cu, params, dtype)

    gradFnew = _grad_from_mv(unew, s.d, Mu, Cu)
    Fnew = jnp.dot(unew, gradFnew)
    deltaF = Fnew - s.F

    # ---- line-search decision (reference: clipper.cpp:246-251) ----
    # candidate accepted when objective did not decrease, or when the
    # line-search budget is exhausted (last candidate is kept).
    eps_ls = msrc._eps_like(params.eps, jnp.abs(s.F), dtype)
    if ls_slack:
        eps_ls = jnp.maximum(eps_ls,
                             jnp.asarray(ls_slack, dtype) * jnp.abs(s.F))
    backtrack = (deltaF < -eps_ls) & (s.lsk + 1 < params.maxlsiters)
    accept = ~backtrack

    # ---- inner-step update on accept (reference: clipper.cpp:253-261) ----
    deltau = jnp.linalg.norm(unew - s.u)
    tol_u = msrc._eps_like(params.tol_u, 1.0, dtype)
    tol_F = msrc._eps_like(params.tol_F, jnp.abs(Fnew), dtype)
    inner_conv = (deltau < tol_u) | (jnp.abs(deltaF) < tol_F)
    j_next = s.j + 1
    inner_done = accept & (inner_conv | (j_next >= params.maxiniters))

    # ---- outer transition (reference: clipper.cpp:268-280, 218-220) ----
    # d_scale < 1 refines the homotopy schedule (d += d_scale * deltad):
    # measured round 5, the exact-arithmetic engines lose 3-4 pts of
    # recall at mid outlier ratios under the reference's full-step
    # schedule (partial-clique basins, Fmin 118 vs 182 at rho=0.8), while
    # d_scale=0.15 restores the stacked engine's basins exactly at ~2%
    # headline cost (the multiprobe ticks absorb the extra outers).
    # Default 1.0 = reference schedule (f64 parity untouched).
    idxD, ratio = d_terms(unew, Mu, Cu)
    active = jnp.any(idxD)
    deltad = msrc._masked_mean(jnp.abs(ratio), idxD)
    if d_scale != 1.0:
        deltad = deltad * jnp.asarray(d_scale, dtype)
    d_new = s.d + deltad
    i_next = jnp.where(active, s.i + 1, s.i)
    outer_exhausted = i_next >= params.maxoliters
    lane_done = inner_done & (~active | outer_exhausted)

    # stalled-homotopy guard (see msrc._STALL_OUTERS): inner converged on
    # its first step without moving u, for several consecutive outers
    frozen = inner_done & (s.j == 0) & (deltau < tol_u)
    stall_next = jnp.where(inner_done,
                           jnp.where(frozen, s.stall + 1, 0), s.stall)
    if stall_guard:
        lane_done = lane_done | (inner_done & (stall_next >= stall_outers))

    # refreshed gradient/objective for the new d (same Mu/Cu — this IS
    # the matvec the reference recomputes at clipper.cpp:219)
    grad_refresh = _grad_from_mv(unew, d_new, Mu, Cu)
    F_refresh = jnp.dot(unew, grad_refresh)

    take_outer = inner_done & active & ~outer_exhausted & ~lane_done

    u_out = jnp.where(accept, unew, s.u)
    gradF_out = jnp.where(take_outer, grad_refresh,
                          jnp.where(accept, gradFnew, s.gradF))
    F_out = jnp.where(take_outer, F_refresh,
                      jnp.where(accept, Fnew, s.F))
    d_out = jnp.where(take_outer, d_new, s.d)
    if warm_alpha:
        alpha_up = jnp.minimum(one, s.alpha / params.beta)
    else:
        alpha_up = one
    alpha_out = jnp.where(accept, alpha_up, s.alpha * params.beta)
    lsk_out = jnp.where(accept, 0, s.lsk + 1)
    j_out = jnp.where(inner_done, 0, jnp.where(accept, j_next, s.j))
    i_out = jnp.where(inner_done, i_next, s.i)

    # frozen lanes keep their state (vmap: other lanes may still run)
    frz = s.done
    return _FlatState(
        u=jnp.where(frz, s.u, u_out),
        gradF=jnp.where(frz, s.gradF, gradF_out),
        F=jnp.where(frz, s.F, F_out),
        d=jnp.where(frz, s.d, d_out),
        alpha=jnp.where(frz, s.alpha, alpha_out),
        lsk=jnp.where(frz, s.lsk, lsk_out),
        j=jnp.where(frz, s.j, j_out),
        i=jnp.where(frz, s.i, i_out),
        done=s.done | lane_done,
        stall=jnp.where(frz, s.stall, stall_next),
        ticks=jnp.where(frz, s.ticks, s.ticks + 1),
        nback=jnp.where(frz | accept, s.nback, s.nback + 1),
    )


def make_flat_tick(dual_matvec, params: Params, dtype,
                   ls_slack: float = 0.0, warm_alpha: bool = False,
                   d_scale: float = 1.0):
    """One probe tick of the flat state machine: _FlatState -> _FlatState.

    Exactly the body of :func:`flat_solve_single`'s while_loop; lanes with
    ``done`` set are frozen, so the tick can be driven by any schedule
    (while_loop, fixed windows in a pool, ...) without changing results.
    Composed from :func:`_tick_probe` + one dual matvec + :func:`_tick_update`
    so batched drivers (parallel.pool's flat-triangle engine) can run the
    matvec once for all lanes with bit-identical per-lane arithmetic.
    ls_slack / warm_alpha: see :func:`_tick_update` (defaults preserve
    reference trajectories).
    """

    def body(s: _FlatState):
        # ---- probe (reference: clipper.cpp:235-242) ----
        unew = _tick_probe(s)
        Mu, Cu = dual_matvec(unew)
        return _tick_update(s, unew, Mu, Cu, params, dtype, ls_slack,
                            warm_alpha, d_scale=d_scale)

    return body



def flat_solve_single(
    dual_matvec: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    u0: jnp.ndarray,
    params: Params = Params(),
    *,
    d_scale: float = 1.0,
    return_ticks: bool = False,
):
    """One lane of the flattened solver. vmap this for batches.

    dual_matvec(u) must return (M @ u, C @ u).
    Returns (u, F, ifinal) with reference semantics; with
    ``return_ticks=True`` also the lane's total probe count (for tail
    diagnostics under vmap). d_scale: homotopy schedule refinement (see
    :func:`_tick_update`; 1.0 = reference schedule).
    """
    tick = make_flat_tick(dual_matvec, params, u0.dtype, d_scale=d_scale)
    init = flat_init(dual_matvec, u0, params)
    s = jax.lax.while_loop(lambda s: ~s.done, tick, init)
    if return_ticks:
        return s.u, s.F, s.i, s.ticks, s.nback
    return s.u, s.F, s.i


def _mp_probe(s: _FlatState, K: int, beta):
    """K backtracking candidates (K, m) + their alphas (K,) for one lane.

    Candidate step sizes are built by the reference's repeated
    alpha * beta multiplication (reference: src/clipper.cpp:246-248) so
    every candidate bit-matches the sequential path's probes.
    """
    a = s.alpha
    alist = [a]
    for _ in range(K - 1):
        a = a * beta
        alist.append(a)
    alphas = jnp.stack(alist)                              # (K,)
    U = jnp.maximum(s.u[None, :] + alphas[:, None] * s.gradF[None, :], 0.0)
    U = U / jnp.linalg.norm(U, axis=1, keepdims=True)      # (K, m)
    return U, alphas


def _mp_update(s: _FlatState, U, MU, CU, alphas, params: Params, dtype,
               warm_alpha: bool = False,
               stall_outers: int = 0,
               d_scale: float = 1.0) -> _FlatState:
    """Multiprobe tick tail: pick the first acceptable candidate
    (reference: clipper.cpp:246-251) and run the standard accept/inner/
    outer transitions — the (K, m)-oriented core of
    :func:`flat_solve_single_multiprobe`'s loop body, shared with the
    batched pool driver."""
    K = U.shape[0]
    one = jnp.asarray(1.0, dtype)
    beta = jnp.asarray(params.beta, dtype)
    stall_guard = msrc._stall_guard_enabled(dtype)
    stall_outers = stall_outers or msrc._STALL_OUTERS

    sU = jnp.sum(U, axis=1)                                # (K,)
    gradFnewK = (MU + U) - s.d * (sU[:, None] - CU - U)
    FnewK = jnp.einsum("km,km->k", U, gradFnewK)
    deltaFK = FnewK - s.F

    eps_ls = msrc._eps_like(params.eps, jnp.abs(s.F), dtype)
    pos = s.lsk + jnp.arange(K, dtype=s.lsk.dtype)
    ok = (deltaFK >= -eps_ls) | (pos + 1 >= params.maxlsiters)
    accept = jnp.any(ok)
    q = jnp.argmax(ok)                                     # first True
    unew = U[q]
    Mu_q = MU[q]
    Cu_q = CU[q]
    gradFnew = gradFnewK[q]
    Fnew = FnewK[q]
    deltaF = deltaFK[q]

    deltau = jnp.linalg.norm(unew - s.u)
    tol_u = msrc._eps_like(params.tol_u, 1.0, dtype)
    tol_F = msrc._eps_like(params.tol_F, jnp.abs(Fnew), dtype)
    inner_conv = (deltau < tol_u) | (jnp.abs(deltaF) < tol_F)
    j_next = s.j + 1
    inner_done = accept & (inner_conv | (j_next >= params.maxiniters))

    idxD, ratio = _d_terms(unew, Mu_q, Cu_q, params, dtype)
    active = jnp.any(idxD)
    deltad = msrc._masked_mean(jnp.abs(ratio), idxD)
    if d_scale != 1.0:
        deltad = deltad * jnp.asarray(d_scale, dtype)
    d_new = s.d + deltad
    i_next = jnp.where(active, s.i + 1, s.i)
    outer_exhausted = i_next >= params.maxoliters
    lane_done = inner_done & (~active | outer_exhausted)

    frozen = inner_done & (s.j == 0) & (deltau < tol_u)
    stall_next = jnp.where(inner_done,
                           jnp.where(frozen, s.stall + 1, 0), s.stall)
    if stall_guard:
        lane_done = lane_done | (inner_done & (stall_next >= stall_outers))

    grad_refresh = _grad_from_mv(unew, d_new, Mu_q, Cu_q)
    F_refresh = jnp.dot(unew, grad_refresh)

    take_outer = inner_done & active & ~outer_exhausted & ~lane_done

    u_out = jnp.where(accept, unew, s.u)
    gradF_out = jnp.where(take_outer, grad_refresh,
                          jnp.where(accept, gradFnew, s.gradF))
    F_out = jnp.where(take_outer, F_refresh,
                      jnp.where(accept, Fnew, s.F))
    d_out = jnp.where(take_outer, d_new, s.d)
    if warm_alpha:
        alpha_up = jnp.minimum(one, alphas[q] / params.beta)
    else:
        alpha_up = one
    alpha_out = jnp.where(accept, alpha_up, alphas[-1] * beta)
    lsk_out = jnp.where(accept, 0, s.lsk + K)
    j_out = jnp.where(inner_done, 0, jnp.where(accept, j_next, s.j))
    i_out = jnp.where(inner_done, i_next, s.i)

    frz = s.done
    return _FlatState(
        u=jnp.where(frz, s.u, u_out),
        gradF=jnp.where(frz, s.gradF, gradF_out),
        F=jnp.where(frz, s.F, F_out),
        d=jnp.where(frz, s.d, d_out),
        alpha=jnp.where(frz, s.alpha, alpha_out),
        lsk=jnp.where(frz, s.lsk, lsk_out),
        j=jnp.where(frz, s.j, j_out),
        i=jnp.where(frz, s.i, i_out),
        done=s.done | lane_done,
        stall=jnp.where(frz, s.stall, stall_next),
        ticks=jnp.where(frz, s.ticks, s.ticks + 1),
        nback=jnp.where(frz, s.nback,
                        s.nback + jnp.where(accept, q, K).astype(
                            s.nback.dtype)),
    )


def make_flat_tick_multiprobe_batched(batch_dual, params: Params, dtype,
                                      probes: int,
                                      warm_alpha: bool = False,
                                      stall_outers: int = 0,
                                      d_scale: float = 1.0):
    """Batched K-wide multiprobe tick: (idx, states) -> states.

    Each tick evaluates K backtracking candidates per lane in ONE batched
    matvec over (B, K, m) candidate rows. In the flat-triangle Pallas
    kernel the extra candidate rows ride the same storage read and MXU
    passes, so a tick costs ~the same as K = 1 — collapsing every
    backtracking chain of up to K rejected probes into a single tick
    (semantics identical to the sequential reference line search, see
    :func:`flat_solve_single_multiprobe`). The measured motivation
    (round 5): exact-arithmetic matvecs spend ~half their ticks on honest
    rejected probes that XLA's noisy fused GEMV happened to accept.
    """
    K = int(probes)
    beta = jnp.asarray(params.beta, dtype)

    def body(idx, ls: _FlatState) -> _FlatState:
        U, alphas = jax.vmap(lambda s: _mp_probe(s, K, beta))(ls)
        MU, CU = batch_dual(idx, U)                  # (B, K, m) each
        return jax.vmap(
            lambda s, u, mu, cu, al: _mp_update(s, u, mu, cu, al, params,
                                                dtype, warm_alpha,
                                                stall_outers, d_scale))(
            ls, U, MU, CU, alphas)

    return body


def flat_solve_ticks(dual_matvec, state: _FlatState,
                     params: Params = Params(), *,
                     ticks: int) -> _FlatState:
    """Advance a flat-solver carry by at most ``ticks`` probe ticks.

    The checkpoint/resume primitive: the carry (_FlatState — u, d, F,
    alpha, loop counters) is a plain pytree, so an hours-long solve can be
    driven in bounded chunks with the state saved to disk between them
    (utils.checkpoint.save_solver_state) and survives preemption. The tick
    function is EXACTLY :func:`flat_solve_single`'s, so chunked driving
    reproduces the uninterrupted trajectory bit-for-bit: resuming from a
    saved state is indistinguishable from never stopping. (A Solution-level
    warm start loses the homotopy d and line-search alpha — the reference's
    solve(u0) restarts those from scratch, include/clipper/clipper.h:102.)
    """
    dtype = state.u.dtype
    tick = make_flat_tick(dual_matvec, params, dtype)
    target = state.ticks + ticks

    def cond(s: _FlatState):
        return (~s.done) & (s.ticks < target)

    return jax.lax.while_loop(cond, tick, state)


def flat_solve_single_multiprobe(
    dual_matvec: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    u0: jnp.ndarray,
    params: Params = Params(),
    *,
    probes: int = 8,
    d_scale: float = 1.0,
    return_ticks: bool = False,
):
    """Flat solver with a K-wide line search: K candidates per matvec tick.

    The batch critical path of :func:`flat_solve_single` is dominated by
    line-search backtracking (measured on the headline workload: the slowest
    lane runs ~17 accepted steps but ~108 rejected probes — each one a full
    matvec tick). Backtracking probes u + alpha beta^q gradF for successive
    q are independent given (u, gradF), so evaluate ``probes`` of them in ONE
    dual matvec: the (2m, m) @ (m, K) skinny matmul reads M exactly once —
    the same HBM traffic as the K=1 GEMV, which is what a tick's cost is on
    TPU (the MXU idles either way).

    Semantics are IDENTICAL to the sequential backtracking line search of the
    reference (reference: src/clipper.cpp:234-251): the accepted candidate is
    the first position p (in backtracking order) with deltaF >= -eps or
    p + 1 >= maxlsiters, and candidate step sizes are built by the same
    repeated alpha * beta multiplication. Only float reduction order inside
    the matvec may differ from the K=1 path.

    dual_matvec must accept an (m, K) matrix of candidate columns and return
    (M @ U, C @ U) — :func:`stacked_dual_matvec` already does.
    """
    K = int(probes)
    assert K >= 1
    dtype = u0.dtype
    eps = jnp.asarray(params.eps, dtype)
    beta = jnp.asarray(params.beta, dtype)
    stall_guard = msrc._stall_guard_enabled(dtype)

    def mv_vec(u):
        Mu, Cu = dual_matvec(u[:, None])
        return Mu[:, 0], Cu[:, 0]

    def d_terms(u, Mu, Cu):
        su = jnp.sum(u)
        Cbu = su - Cu - u
        eps_d = msrc._eps_active(params.eps, su, dtype)
        idxD = (Cbu > eps_d) & (u > eps)
        num = Mu + u
        ratio = num / jnp.where(idxD, Cbu, 1.0)
        return idxD, ratio

    # ---- init (reference: clipper.cpp:193-209) ----
    Mu0, _ = mv_vec(u0)
    u = Mu0 + u0 if params.rescale_u0 else u0
    u = u / jnp.linalg.norm(u)
    Mu, Cu = mv_vec(u)
    idxD, ratio = d_terms(u, Mu, Cu)
    d0 = jnp.where(jnp.any(idxD), msrc._masked_mean(ratio, idxD), 0.0)
    d0 = d0.astype(dtype)
    gradF0 = _grad_from_mv(u, d0, Mu, Cu)
    F0 = jnp.dot(u, gradF0)

    one = jnp.asarray(1.0, dtype)

    def cond(s: _FlatState):
        return ~s.done

    def body(s: _FlatState):
        # ---- K probe candidates; alphas via the reference's repeated
        # alpha *= beta so every candidate bit-matches the sequential path
        a = s.alpha
        alist = [a]
        for _ in range(K - 1):
            a = a * beta
            alist.append(a)
        alphas = jnp.stack(alist)                         # (K,)
        U = jnp.maximum(s.u[:, None] + alphas[None, :] * s.gradF[:, None],
                        0.0)
        U = U / jnp.linalg.norm(U, axis=0, keepdims=True)
        MU, CU = dual_matvec(U)                           # (m, K) each
        sU = jnp.sum(U, axis=0)
        # cancellation-free gradient form — see _grad_from_mv
        gradFnewK = (MU + U) - s.d * (sU[None, :] - CU - U)
        FnewK = jnp.einsum("mk,mk->k", U, gradFnewK)
        deltaFK = FnewK - s.F

        # ---- first acceptable candidate (reference: clipper.cpp:246-251)
        eps_ls = msrc._eps_like(params.eps, jnp.abs(s.F), dtype)
        pos = s.lsk + jnp.arange(K, dtype=s.lsk.dtype)
        ok = (deltaFK >= -eps_ls) | (pos + 1 >= params.maxlsiters)
        accept = jnp.any(ok)
        q = jnp.argmax(ok)                                # first True
        unew = jnp.take(U, q, axis=1)
        Mu_q = jnp.take(MU, q, axis=1)
        Cu_q = jnp.take(CU, q, axis=1)
        gradFnew = jnp.take(gradFnewK, q, axis=1)
        Fnew = FnewK[q]
        deltaF = deltaFK[q]

        # ---- inner-step update on accept (reference: clipper.cpp:253-261)
        deltau = jnp.linalg.norm(unew - s.u)
        tol_u = msrc._eps_like(params.tol_u, 1.0, dtype)
        tol_F = msrc._eps_like(params.tol_F, jnp.abs(Fnew), dtype)
        inner_conv = (deltau < tol_u) | (jnp.abs(deltaF) < tol_F)
        j_next = s.j + 1
        inner_done = accept & (inner_conv | (j_next >= params.maxiniters))

        # ---- outer transition (reference: clipper.cpp:268-280, 218-220)
        idxD, ratio = d_terms(unew, Mu_q, Cu_q)
        active = jnp.any(idxD)
        deltad = msrc._masked_mean(jnp.abs(ratio), idxD)
        if d_scale != 1.0:
            deltad = deltad * jnp.asarray(d_scale, dtype)
        d_new = s.d + deltad
        i_next = jnp.where(active, s.i + 1, s.i)
        outer_exhausted = i_next >= params.maxoliters
        lane_done = inner_done & (~active | outer_exhausted)

        # stalled-homotopy guard (see msrc._STALL_OUTERS): inner converged on
        # its first step without moving u, for several consecutive outers
        frozen = inner_done & (s.j == 0) & (deltau < tol_u)
        stall_next = jnp.where(inner_done,
                               jnp.where(frozen, s.stall + 1, 0), s.stall)
        if stall_guard:
            lane_done = lane_done | (inner_done &
                                     (stall_next >= msrc._STALL_OUTERS))

        grad_refresh = _grad_from_mv(unew, d_new, Mu_q, Cu_q)
        F_refresh = jnp.dot(unew, grad_refresh)

        take_outer = inner_done & active & ~outer_exhausted & ~lane_done

        u_out = jnp.where(accept, unew, s.u)
        gradF_out = jnp.where(take_outer, grad_refresh,
                              jnp.where(accept, gradFnew, s.gradF))
        F_out = jnp.where(take_outer, F_refresh,
                          jnp.where(accept, Fnew, s.F))
        d_out = jnp.where(take_outer, d_new, s.d)
        alpha_out = jnp.where(accept, one, alist[-1] * beta)
        lsk_out = jnp.where(accept, 0, s.lsk + K)
        j_out = jnp.where(inner_done, 0, jnp.where(accept, j_next, s.j))
        i_out = jnp.where(inner_done, i_next, s.i)

        frz = s.done
        return _FlatState(
            u=jnp.where(frz, s.u, u_out),
            gradF=jnp.where(frz, s.gradF, gradF_out),
            F=jnp.where(frz, s.F, F_out),
            d=jnp.where(frz, s.d, d_out),
            alpha=jnp.where(frz, s.alpha, alpha_out),
            lsk=jnp.where(frz, s.lsk, lsk_out),
            j=jnp.where(frz, s.j, j_out),
            i=jnp.where(frz, s.i, i_out),
            done=s.done | lane_done,
            stall=jnp.where(frz, s.stall, stall_next),
            ticks=jnp.where(frz, s.ticks, s.ticks + 1),
            nback=jnp.where(frz, s.nback,
                            s.nback + jnp.where(accept, q, K).astype(
                                s.nback.dtype)),
        )

    init = _FlatState(u=u, gradF=gradF0, F=F0, d=d0, alpha=one,
                      lsk=jnp.int32(0), j=jnp.int32(0), i=jnp.int32(0),
                      done=jnp.asarray(False), stall=jnp.int32(0),
                      ticks=jnp.int32(0), nback=jnp.int32(0))
    s = jax.lax.while_loop(cond, body, init)
    if return_ticks:
        return s.u, s.F, s.i, s.ticks, s.nback
    return s.u, s.F, s.i


def recompute_objective(dual_matvec, u: jnp.ndarray) -> jnp.ndarray:
    """Re-evaluate the final objective in the matvec's precision.

    At convergence the support of u is a clique, so u' Cb u = 0 and the
    reference objective F = u' gradF reduces to u' (M + I) u exactly,
    independent of d. Use this to polish F in f32 after a reduced-precision
    (bf16) iteration — the rounding rule omega = round(F)
    (reference: src/clipper.cpp:305) needs F accurate to well under 0.5.
    """
    Mu, _ = dual_matvec(u)
    return jnp.dot(u, Mu + u)


# int8 affinity quantization scale: M entries live in [0, 1] (Gaussian
# consistency scores, reference: src/invariants/euclidean_distance.cpp:28),
# C entries in {0, 1}; storing round(127 * [M; C]) lets ONE uniform 1/127
# output scale serve both halves (C dequantizes exactly). Resolution 1/127
# ~ 0.8% absolute — comparable to bf16's 0.4% relative at the entries that
# carry the density; the final objective is re-polished in full precision
# before rounding either way.
_INT8_SCALE = 127.0


def quantize_stacked(MC: jnp.ndarray) -> jnp.ndarray:
    """[M; C] in [0, 1] -> int8 storage (see _INT8_SCALE)."""
    q = jnp.round(MC * _INT8_SCALE)
    return jnp.clip(q, 0, 127).astype(jnp.int8)


def stacked_dual_matvec(M: jnp.ndarray, C: jnp.ndarray,
                        storage_dtype=None):
    """Default dual matvec: one matmul over the stacked [M; C] matrix.

    storage_dtype=jnp.bfloat16 halves the HBM traffic of the hot loop;
    storage_dtype=jnp.int8 quarters it (the int8->bf16 dequantization fuses
    into the matmul, so HBM reads are the int8 bytes). The contraction
    accumulates in f32 (preferred_element_type) for reduced storage, and
    callers should re-evaluate the final objective in full precision with
    :func:`recompute_objective` before rounding.
    """
    MC = jnp.concatenate([M, C], axis=0)   # (2m, m)
    m = M.shape[0]
    out_dtype = M.dtype
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
        return make_stacked_matvec(quantize_stacked(MC), out_dtype)
    if storage_dtype is not None:
        MC = MC.astype(storage_dtype)
    return make_stacked_matvec(MC, out_dtype)


def make_stacked_matvec(MC: jnp.ndarray, out_dtype):
    """Dual matvec over prepared stacked storage (f64/f32/bf16/int8).

    Shared by stacked_dual_matvec and the pool engine so a lane's
    arithmetic is identical under either scheduler.
    """
    two_m = MC.shape[0]
    m = two_m // 2
    if MC.dtype == jnp.int8:
        inv_scale = jnp.asarray(1.0 / _INT8_SCALE, out_dtype)

        def mv(u):
            y = jax.lax.dot_general(
                MC.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_dtype)
            y = y * inv_scale
            return y[:m], y[m:]

        return mv

    acc_dtype = out_dtype if MC.dtype == out_dtype else jnp.float32

    def mv(u):
        y = jax.lax.dot_general(
            MC, u.astype(MC.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype).astype(out_dtype)
        return y[:m], y[m:]

    return mv


def solve_multistart(M: jnp.ndarray, C: jnp.ndarray, u0s: jnp.ndarray,
                     params: Params = Params()) -> Solution:
    """Solve one problem from K random inits in parallel; keep the best.

    The PGA solver is a local method: different u0 can land on different
    dense clusters (the reference documents this sensitivity —
    reference: examples/matlab/ex3_planecloud.m:95-98, clipper.h:44-47).
    Batching makes restarts nearly free on TPU, so run K lanes over the SAME
    (M, C) and return the solution with the highest objective F (the denser
    cluster). u0s: (K, m).
    """
    mv = stacked_dual_matvec(M, C)

    def one(u0):
        u, F, ifinal = flat_solve_single(mv, u0, params)
        return u, F, ifinal

    us, Fs, ifinals = jax.vmap(one)(u0s)
    best = jnp.argmax(Fs)
    u, F, ifinal = us[best], Fs[best], ifinals[best]
    rounding = params.rounding
    if rounding == Rounding.DSD:
        rounding = Rounding.NONZERO
    mask = msrc.round_solution(u, F, rounding)
    return Solution(ifinal=ifinal, mask=mask, u0=u0s[best], u=u, score=F)


def solve_batched(Ms: jnp.ndarray, Cs: jnp.ndarray, u0s: jnp.ndarray,
                  params: Params = Params()) -> Solution:
    """Batched flat solve over (B, m, m) matrices. Jit-friendly."""

    def one(M, C, u0):
        u, F, ifinal = flat_solve_single(stacked_dual_matvec(M, C), u0, params)
        rounding = params.rounding
        if rounding == Rounding.DSD:
            rounding = Rounding.NONZERO
        mask = msrc.round_solution(u, F, rounding)
        return Solution(ifinal=ifinal, mask=mask, u0=u0, u=u, score=F)

    return jax.vmap(one)(Ms, Cs, u0s)
