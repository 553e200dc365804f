"""MSRC-SDR: semidefinite relaxation of the maximum-spectral-radius clique.

The reference parses the problem into SCS conic form (half-vectorization,
zero cone for constrained pairs, positive orthant, one PSD cone, trace row —
reference: src/sdp.cpp:96-214) and calls the external SCS solver. The
TPU-native design removes the conic parser entirely and solves the same
program directly on dense (M, C) with an ADMM splitting whose two projections
are MXU/eigh-friendly:

    maximize   <M, X>
    subject to tr(X) = 1,  X >= 0 (PSD),
               X_ij >= 0            where C_ij = 1
               X_ij  = 0            where C_ij = 0

Splitting X = Z:
    X-step: elementwise projection of (Z - U + M/rho) onto the sign/zero
            pattern constraints (pure VPU).
    Z-step: projection of (X + U) onto the spectrahedron
            {Z PSD, tr Z = 1} = eigh + simplex projection of eigenvalues.
    U    += X - Z.

SCS-grade machinery, TPU-native:
  * adaptive rho by residual balancing (r_prim vs r_dual), with the scaled
    dual U rescaled on every change;
  * safeguarded type-II Anderson acceleration on the (Z, U) fixed point,
    attempted every ``acceleration_interval`` iterations over a
    ``acceleration_lookback``-deep difference history (fixed-size buffers,
    jit-friendly); a candidate is accepted only if it does not increase the
    fixed-point residual (one extra map application per attempt), mirroring
    SCS's safeguarded AA (reference: include/clipper/sdp.h:39-52);
  * a CERTIFIED dual bound: from the consensus dual T = rho*U, repair to an
    exactly dual-feasible point (W = max(T - M, 0) on the allowed set,
    Y = T on the zero set; both are valid multipliers by construction) and
    report dobj = lambda_max(M + W + Y) — an upper bound on the SDP optimum
    for ANY iterate, so gap = dobj - pobj is a true optimality certificate.

Infeasibility certificates (SCS's eps_infeas) are vacuous for MSRC-SDR:
X = I/n is strictly feasible for every (M, C) with unit diagonal and the
spectrahedron is compact, so neither primal nor dual infeasibility can
occur; eps_infeas is retained for API parity only.

Node extraction matches the reference exactly (reference: src/sdp.cpp:251-262):
take the top eigenvector v of X; select i with |v_i| > max|v|/2.

Everything is one jitted lax.while_loop; eigh dominates and runs as XLA's
batched QR-based eigensolver on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Params:
    """Mirrors reference sdp::Params (reference: include/clipper/sdp.h:39-52).

    acceleration_interval/lookback drive the safeguarded Anderson scheme
    (0 disables it). eps_infeas is a no-op by mathematics, not omission —
    see module docstring.
    """

    verbose: bool = False             # live residual prints (chunked driver)
    max_iters: int = 2000
    acceleration_interval: int = 10
    acceleration_lookback: int = 10
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_infeas: float = 1e-7          # vacuous for MSRC-SDR (API parity)
    time_limit_secs: float = 0.0      # > 0: interruptible chunked driver
    rho: float = 2.0                  # initial ADMM penalty
    alpha: float = 1.6                # over-relaxation in (1, 2)
    adaptive_rho: bool = True         # residual balancing
    rho_mu: float = 10.0              # imbalance trigger
    rho_tau: float = 2.0              # scale factor per adjustment
    # large-m route: rank-r spectrahedron projection via warm-started
    # subspace iteration instead of the full O(n^3) eigh (0 = exact eigh).
    # The optimal X of MSRC-SDR is (near) rank-1 — the simplex projection
    # zeroes all but the top few eigenvalues — so a small r captures the
    # exact projection once tau clears lambda_{r+1}; earlier iterations are
    # inexact-ADMM steps, and the f64 dual-repair certificate stays valid
    # for ANY iterate, so the reported gap remains a true bound.
    z_rank: int = 0
    z_power_iters: int = 2            # subspace refinement rounds per step
    # auto_tune de-arms the scale foot-guns BENCH.md round 4 measured:
    # reference-parity eps = 1e-3 under-converges extraction at n >= 2048
    # (P/R collapse), the exact eigh passes its knee there (195 ms/iter),
    # and the AA history (2 x L x 2 n^2 f32) reaches 10.7 GB at n = 8192.
    # With auto_tune=True, solve() tightens eps to <= 1e-4, switches to the
    # rank-64 Z-step, and disables AA over ~2 GB of history — each with a
    # warning naming the override. Set False for raw reference-parity
    # defaults at every scale.
    auto_tune: bool = True


# auto_tune thresholds (measured knees, BENCH.md round 4)
_TUNE_N_EPS = 2048          # eps=1e-3 extraction collapse from here
_TUNE_EPS = 1e-4
_TUNE_N_ZRANK = 2048        # exact-eigh knee
_TUNE_ZRANK = 64
_TUNE_AA_BYTES = 2 << 30    # AA difference-history budget


def _resolve_params(params: Params, n: int, itemsize: int) -> Params:
    """Apply auto_tune's scale-dependent overrides (with warnings)."""
    if not params.auto_tune:
        return params
    import warnings

    changes = {}
    if n >= _TUNE_N_EPS and (params.eps_abs > _TUNE_EPS
                             or params.eps_rel > _TUNE_EPS):
        changes["eps_abs"] = min(params.eps_abs, _TUNE_EPS)
        changes["eps_rel"] = min(params.eps_rel, _TUNE_EPS)
        warnings.warn(
            f"sdp auto_tune: eps tightened to {_TUNE_EPS:g} at n={n} "
            f"(eps=1e-3 under-converges extraction for n >= {_TUNE_N_EPS}; "
            "set auto_tune=False to keep your values)", stacklevel=3)
    if params.z_rank == 0 and n >= _TUNE_N_ZRANK:
        changes["z_rank"] = min(_TUNE_ZRANK, n)
        warnings.warn(
            f"sdp auto_tune: z_rank={_TUNE_ZRANK} subspace Z-step at n={n} "
            "(exact eigh per-iteration cost passes its knee here; set "
            "z_rank=-1 or auto_tune=False to force the exact eigh)",
            stacklevel=3)
    L = max(int(params.acceleration_lookback), 0)
    aa_bytes = 2 * L * 2 * n * n * itemsize
    if params.acceleration_interval > 0 and aa_bytes > _TUNE_AA_BYTES:
        changes["acceleration_interval"] = 0
        warnings.warn(
            f"sdp auto_tune: Anderson acceleration disabled at n={n} — its "
            f"difference history would hold {aa_bytes / 2**30:.1f} GiB "
            "(budget 2 GiB); set auto_tune=False to force it", stacklevel=3)
    return dataclasses.replace(params, **changes) if changes else params


def _warn_underconverged(soln: "Solution", params: Params, n: int):
    """Post-solve certificate check: the extraction rule (reference:
    src/sdp.cpp:251-262) reads the top eigenvector of X, which is only
    meaningful near the optimum — surface a loud warning when the certified
    gap says the iterate is not there."""
    if not params.auto_tune:
        return
    rel_gap = soln.gap / max(1.0, abs(soln.pobj))
    if soln.iters >= params.max_iters or rel_gap > 0.05:
        import warnings
        warnings.warn(
            f"sdp: iterate under-converged (iters={soln.iters}/"
            f"{params.max_iters}, certified rel gap {rel_gap:.2e}) — node "
            "extraction from the top eigenvector may be unreliable; raise "
            "max_iters or tighten eps", stacklevel=3)


@dataclasses.dataclass
class Solution:
    """Mirrors reference sdp::Solution (reference: include/clipper/sdp.h:15-37).

    The reference carries a per-stage SCS timing breakdown
    (reference: include/clipper/sdp.h:28-36); the analogous stages here are
    the ADMM solve (t_solve, device) and node extraction (t_extract, host).
    There is no parse stage — the problem is formulated directly on (M, C).

    dobj is a certified upper bound on the SDP optimum (see module
    docstring), so gap = dobj - pobj certifies optimality.
    """

    X: np.ndarray
    lambdas: np.ndarray
    evec1: np.ndarray
    thr: float
    nodes: List[int]
    iters: int
    pobj: float
    dobj: float
    t: float = 0.0
    t_solve: float = 0.0
    t_extract: float = 0.0

    @property
    def gap(self) -> float:
        return self.dobj - self.pobj


def _project_simplex(lam: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection of eigenvalues onto {l >= 0, sum l = 1}."""
    n = lam.shape[0]
    s = jnp.sort(lam)[::-1]
    css = jnp.cumsum(s)
    k = jnp.arange(1, n + 1, dtype=lam.dtype)
    cond = s - (css - 1.0) / k > 0
    rho = jnp.max(jnp.where(cond, jnp.arange(1, n + 1), 0))
    tau = (css[rho - 1] - 1.0) / rho.astype(lam.dtype)
    return jnp.maximum(lam - tau, 0.0)


class _State(NamedTuple):
    it: jnp.ndarray
    Z: jnp.ndarray
    U: jnp.ndarray
    rho: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    done: jnp.ndarray
    # Anderson acceleration difference histories over vec([Z; U]) (L, d)
    dF: jnp.ndarray
    dG: jnp.ndarray
    f_prev: jnp.ndarray
    g_prev: jnp.ndarray
    hist: jnp.ndarray   # valid history depth (reset on rho change)
    Qsub: jnp.ndarray   # (n, r) warm-started subspace basis (z_rank > 0)


def _admm_pieces(M: jnp.ndarray, C: jnp.ndarray, params: Params):
    """Build (init_state, body) for the ADMM loop (shared by the one-shot
    jitted solve and the host-chunked driver that honors time_limit)."""
    n = M.shape[0]
    dtype = M.dtype
    alpha = jnp.asarray(params.alpha, dtype)
    allowed = C != 0          # C has identity diagonal: X_ii >= 0 allowed
    L = max(int(params.acceleration_lookback), 0)
    use_aa = params.acceleration_interval > 0 and L > 0
    d = 2 * n * n

    r = min(int(params.z_rank), n) if params.z_rank else 0

    def x_step(Z, U, rho):
        V = Z - U + M / rho
        return jnp.where(allowed, jnp.maximum(V, 0.0), 0.0)

    def z_step_full(V, Q):
        lam, Qe = jnp.linalg.eigh((V + V.T) / 2)
        lam = _project_simplex(lam)
        return (Qe * lam) @ Qe.T, Q

    def z_step_lowrank(V, Q):
        """Rank-r spectrahedron projection by warm-started subspace
        iteration: O(n^2 r) MXU matmuls + one (r, r) eigh instead of the
        full O(n^3) eigh. The iteration runs on the SHIFTED matrix
        A + c I (c = ||A||_F bounds |lambda|), so the dominant-magnitude
        subspace is the top ALGEBRAIC eigenspace even when A is indefinite;
        Rayleigh-Ritz values are computed on the unshifted A. Exact
        whenever the projection's water level tau clears lambda_{r+1}
        (the generic case: the projected Z is near rank-1); otherwise an
        inexact-ADMM step — self-correcting, and the f64 dual-repair
        certificate is unaffected."""
        A = (V + V.T) / 2
        c = jnp.sqrt(jnp.sum(A * A)) + jnp.asarray(1e-6, dtype)
        for _ in range(max(int(params.z_power_iters), 1)):
            Q = jnp.linalg.qr(A @ Q + c * Q)[0]
        AQ = A @ Q
        S = Q.T @ AQ
        lam, W = jnp.linalg.eigh((S + S.T) / 2)   # (r,) ascending
        lam_p = _project_simplex(lam)
        Qr = Q @ W
        return (Qr * lam_p) @ Qr.T, Q

    z_step = z_step_lowrank if r > 0 else z_step_full

    def fixed_point(Z, U, rho, Q):
        """One ADMM sweep; returns (X, Z+, U+, Q+)."""
        X = x_step(Z, U, rho)
        Xr = alpha * X + (1.0 - alpha) * Z       # over-relaxation
        Zn, Qn = z_step(Xr + U, Q)
        Un = U + Xr - Zn
        return X, Zn, Un, Qn

    def pack(Z, U):
        return jnp.concatenate([Z.reshape(-1), U.reshape(-1)])

    def unpack(v):
        return v[: n * n].reshape(n, n), v[n * n:].reshape(n, n)

    def body(s: _State):
        X, Zp, Up, Qp = fixed_point(s.Z, s.U, s.rho, s.Qsub)

        if use_aa:
            s_in = pack(s.Z, s.U)
            g = pack(Zp, Up)
            f = g - s_in
            # shift difference histories when a previous point exists
            have_prev = s.hist > 0
            dF = jnp.where(have_prev,
                           jnp.roll(s.dF, 1, axis=0).at[0].set(f - s.f_prev),
                           s.dF)
            dG = jnp.where(have_prev,
                           jnp.roll(s.dG, 1, axis=0).at[0].set(g - s.g_prev),
                           s.dG)
            depth = jnp.minimum(s.hist, L)

            def try_aa(_):
                # type-II AA: gamma = argmin ||f - dF' gamma|| over the
                # valid columns; tiny (L, L) regularized normal equations
                valid = (jnp.arange(L) < depth).astype(dtype)
                Fm = dF * valid[:, None]                  # (L, d)
                G_ = Fm @ Fm.T                            # (L, L)
                reg = 1e-10 * (1.0 + jnp.trace(G_))
                gamma = jnp.linalg.solve(
                    G_ + reg * jnp.eye(L, dtype=dtype), Fm @ f)
                gamma = gamma * valid
                cand = g - gamma @ (dG * valid[:, None])
                Zc, Uc = unpack(cand)
                # safeguard: accept only if the fixed-point residual at the
                # candidate does not exceed the plain iterate's
                _, Zc2, Uc2, Qc = fixed_point(Zc, Uc, s.rho, Qp)
                fc = pack(Zc2, Uc2) - cand
                ok = (jnp.linalg.norm(fc) <= jnp.linalg.norm(f)) & (depth > 0)
                Zn = jnp.where(ok, Zc2, Zp)
                Un = jnp.where(ok, Uc2, Up)
                Qn = jnp.where(ok, Qc, Qp)
                return Zn, Un, Qn

            do_try = (s.it % params.acceleration_interval
                      == params.acceleration_interval - 1) & (depth > 0)
            Zn, Un, Qp = jax.lax.cond(do_try, try_aa,
                                      lambda _: (Zp, Up, Qp), None)
        else:
            Zn, Un = Zp, Up
            dF = s.dF
            dG = s.dG
            f = s.f_prev
            g = s.g_prev

        r_prim = jnp.linalg.norm(X - Zn)
        r_dual = s.rho * jnp.linalg.norm(Zn - s.Z)
        # SCS-style scaling: absolute term grows with sqrt(#entries of the
        # iterate) = n, NOT with n^2-ish n — for unit-trace X the Frobenius
        # norm is O(1), so an n-proportional absolute term would dominate
        # the test at large n and declare instant convergence (caught at
        # m=1024: 2 "converged" iterations with a gap of 51 — see BENCH.md)
        sqn = np.sqrt(n)
        eps_p = (params.eps_abs * sqn
                 + params.eps_rel * jnp.maximum(jnp.linalg.norm(X),
                                                jnp.linalg.norm(Zn)))
        eps_d = (params.eps_abs * sqn
                 + params.eps_rel * jnp.linalg.norm(s.rho * Un))
        done = (r_prim < eps_p) & (r_dual < eps_d)

        # residual balancing (Boyd et al. §3.4.1): rescale the SCALED dual
        # on every rho change; AA history is invalidated by the rescale
        rho = s.rho
        hist = jnp.minimum(s.hist + 1, L) if use_aa else s.hist
        if params.adaptive_rho:
            up = r_prim > params.rho_mu * r_dual
            down = r_dual > params.rho_mu * r_prim
            scale = jnp.where(up, params.rho_tau,
                              jnp.where(down, 1.0 / params.rho_tau, 1.0))
            scale = scale.astype(dtype)
            rho = jnp.clip(rho * scale, 1e-3, 1e3)
            Un = Un * (s.rho / rho)
            hist = jnp.where(rho != s.rho, 0, hist)

        return _State(s.it + 1, Zn, Un, rho, r_prim, r_dual, done,
                      dF, dG, f, g, hist, Qp)

    Z0 = jnp.eye(n, dtype=dtype) / n
    Lb = max(L, 1) if use_aa else 1
    Q0 = jnp.eye(n, r, dtype=dtype) if r > 0 else jnp.zeros((1, 1), dtype)
    init = _State(jnp.int32(0), Z0, jnp.zeros_like(M),
                  jnp.asarray(params.rho, dtype),
                  jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                  jnp.asarray(False),
                  jnp.zeros((Lb, d) if use_aa else (1, 1), dtype),
                  jnp.zeros((Lb, d) if use_aa else (1, 1), dtype),
                  jnp.zeros(d if use_aa else 1, dtype),
                  jnp.zeros(d if use_aa else 1, dtype),
                  jnp.int32(0), Q0)
    return init, body


@functools.partial(jax.jit, static_argnames=("params",))
def _admm_finalize(M: jnp.ndarray, C: jnp.ndarray, s: _State,
                   params: Params):
    allowed = C != 0
    X = s.Z  # the PSD/trace-feasible iterate
    lam, Q = jnp.linalg.eigh(X)
    evec1 = Q[:, -1]
    pobj = jnp.sum(M * X)

    # in-graph dual bound: repair T = rho*U to exact dual feasibility.
    # Dual: min nu s.t. nu*I - M - W - Y >= 0 (PSD), W >= 0 on the allowed
    # set, Y free on the zero set. Any such (W, Y) certifies
    # optimum <= nu = lambda_max(M + W + Y). The host paths re-certify in
    # f64 (:func:`_certify_f64`) — the f32 eigvalsh here carries
    # O(|D| n eps) roundoff, visible as slightly negative gaps at m >= 256.
    T = s.rho * (s.U + s.U.T) / 2
    D = jnp.where(allowed, M + jnp.maximum(T - M, 0.0), T)
    dobj = jnp.linalg.eigvalsh(D)[-1]
    return X, lam, evec1, pobj, dobj, s.it, T


def _certify_f64(M, C, X, T):
    """Exact-arithmetic certificate: pobj and the repaired dual bound in
    host f64. (W, Y) are dual-feasible BY CONSTRUCTION for any T, so
    gap = dobj - pobj is a true optimality certificate independent of the
    device precision the iterates were computed in."""
    M64 = np.asarray(M, np.float64)
    X64 = np.asarray(X, np.float64)
    T64 = np.asarray(T, np.float64)
    allowed = np.asarray(C) != 0
    D = np.where(allowed, M64 + np.maximum(T64 - M64, 0.0), T64)
    dobj = float(np.linalg.eigvalsh((D + D.T) / 2)[-1])
    pobj = float(np.sum(M64 * X64))
    return pobj, dobj


@functools.partial(jax.jit, static_argnames=("params",))
def _admm(M: jnp.ndarray, C: jnp.ndarray, params: Params):
    init, body = _admm_pieces(M, C, params)

    def cond(s: _State):
        return (~s.done) & (s.it < params.max_iters)

    s = jax.lax.while_loop(cond, body, init)
    return _admm_finalize(M, C, s, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _admm_init(M: jnp.ndarray, C: jnp.ndarray, params: Params) -> _State:
    init, _ = _admm_pieces(M, C, params)
    return init


@functools.partial(jax.jit, static_argnames=("params", "chunk"))
def _admm_chunk(M: jnp.ndarray, C: jnp.ndarray, s: _State, params: Params,
                chunk: int) -> _State:
    """Advance the ADMM by up to ``chunk`` iterations (or to convergence /
    max_iters). Identical per-iteration arithmetic to :func:`_admm` — the
    trajectory is the same sequence of _State's, just observable from the
    host between chunks, which is what lets solve() honor time_limit_secs
    and verbose (the reference's SCS honors both natively,
    reference: include/clipper/sdp.h:41-44)."""
    _, body = _admm_pieces(M, C, params)
    target = s.it + chunk

    def cond(st: _State):
        return (~st.done) & (st.it < params.max_iters) & (st.it < target)

    return jax.lax.while_loop(cond, body, s)


def solve_batched(Ms, Cs, params: Params = Params()) -> List[Solution]:
    """vmapped SDR solve over a batch of problems (B, n, n).

    The ADMM iteration (elementwise projections + batched eigh) vmaps
    cleanly; used for batched loop-closure cross-checking.
    """
    import time

    t0 = time.perf_counter()
    Ms = jnp.asarray(Ms)
    Cs = jnp.asarray(Cs, Ms.dtype)
    params = _resolve_params(params, Ms.shape[-1], Ms.dtype.itemsize)
    X, lam, evec1, pobj, dobj, iters, T = jax.vmap(
        lambda M, C: _admm(M, C, params))(Ms, Cs)
    X = np.asarray(X)
    lam = np.asarray(lam)
    evec1 = np.asarray(evec1)
    t1 = time.perf_counter()

    out = []
    for b in range(X.shape[0]):
        thr = float(np.abs(evec1[b]).max() / 2.0)
        nodes = [int(i) for i in np.flatnonzero(np.abs(evec1[b]) > thr)]
        pb, db = _certify_f64(Ms[b], Cs[b], X[b], T[b])
        out.append(Solution(X=X[b], lambdas=lam[b], evec1=evec1[b], thr=thr,
                            nodes=nodes, iters=int(iters[b]),
                            pobj=pb, dobj=db,
                            t=t1 - t0, t_solve=t1 - t0))
        _warn_underconverged(out[-1], params, Ms.shape[-1])
    return out


def solve(M, C, params: Params = Params()) -> Solution:
    """Solve the MSRC SDR for dense symmetric M, C WITH identity diagonal
    (the reference passes getAffinityMatrix()/getConstraintMatrix() output —
    reference: src/clipper.cpp:103-104)."""
    import time

    t0 = time.perf_counter()
    M = jnp.asarray(M)
    C = jnp.asarray(C, M.dtype)
    params = _resolve_params(params, M.shape[0], M.dtype.itemsize)
    if params.time_limit_secs > 0 or params.verbose:
        # host-chunked driver: same per-iteration arithmetic, observable
        # between chunks — a long ADMM run is interruptible at chunk
        # granularity and verbose prints live residuals.
        # COST NOTE: each chunk boundary fetches the state to the host;
        # through a remote device tunnel that is a flat ~23 ms of latency
        # per chunk (measured, BENCH.md dispatch economics) on top of the
        # ~25-50 iterations of device work. Leave time_limit_secs=0 and
        # verbose=False (the one-shot jitted path) unless you need the
        # interruptibility.
        chunk = max(int(params.acceleration_interval) * 5, 25)
        s = _admm_init(M, C, params)
        while True:
            s = _admm_chunk(M, C, s, params, chunk)
            it = int(s.it)   # host sync (fetches the state)
            if params.verbose:
                print(f"sdp: iter {it:5d}  r_prim {float(s.r_prim):.3e}  "
                      f"r_dual {float(s.r_dual):.3e}  "
                      f"rho {float(s.rho):.2e}", flush=True)
            if bool(np.asarray(s.done)) or it >= params.max_iters:
                break
            if (params.time_limit_secs > 0
                    and time.perf_counter() - t0 > params.time_limit_secs):
                if params.verbose:
                    print(f"sdp: time limit {params.time_limit_secs}s "
                          f"reached at iter {it}", flush=True)
                break
        X, lam, evec1, pobj, dobj, iters, T = _admm_finalize(M, C, s,
                                                             params)
    else:
        X, lam, evec1, pobj, dobj, iters, T = _admm(M, C, params)

    X = np.asarray(X)
    t1 = time.perf_counter()
    lam = np.asarray(lam)
    evec1 = np.asarray(evec1)

    thr = float(np.abs(evec1).max() / 2.0)
    nodes = [int(i) for i in np.flatnonzero(np.abs(evec1) > thr)]
    # re-certify pobj/dobj in host f64 (exact duals by construction; the
    # device-precision eigvalsh can show tiny negative gaps at f32)
    pobj, dobj = _certify_f64(M, C, X, T)
    t2 = time.perf_counter()

    soln = Solution(X=X, lambdas=lam, evec1=evec1, thr=thr, nodes=nodes,
                    iters=int(iters), pobj=pobj, dobj=dobj,
                    t=t2 - t0, t_solve=t1 - t0, t_extract=t2 - t1)
    _warn_underconverged(soln, params, M.shape[0])
    return soln
