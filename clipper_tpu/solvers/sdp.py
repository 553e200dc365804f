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

    acceleration_* are retained for API parity; this first-order solver uses
    a fixed-penalty ADMM with over-relaxation instead of SCS's AA.
    """

    verbose: bool = False
    max_iters: int = 2000
    acceleration_interval: int = 10   # unused (API parity)
    acceleration_lookback: int = 10   # unused (API parity)
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_infeas: float = 1e-7          # unused (API parity)
    time_limit_secs: float = 0.0      # unused inside jit (API parity)
    rho: float = 2.0                  # ADMM penalty
    alpha: float = 1.6                # over-relaxation in (1, 2)


@dataclasses.dataclass
class Solution:
    """Mirrors reference sdp::Solution (reference: include/clipper/sdp.h:15-37).

    The reference carries a per-stage SCS timing breakdown
    (reference: include/clipper/sdp.h:28-36); the analogous stages here are
    the ADMM solve (t_solve, device) and node extraction (t_extract, host).
    There is no parse stage — the problem is formulated directly on (M, C).
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
    X: jnp.ndarray
    Z: jnp.ndarray
    U: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("params",))
def _admm(M: jnp.ndarray, C: jnp.ndarray, params: Params):
    n = M.shape[0]
    dtype = M.dtype
    rho = jnp.asarray(params.rho, dtype)
    alpha = jnp.asarray(params.alpha, dtype)
    allowed = C != 0          # C has identity diagonal: X_ii >= 0 allowed
    Mrho = M / rho

    def x_step(Z, U):
        V = Z - U + Mrho
        return jnp.where(allowed, jnp.maximum(V, 0.0), 0.0)

    def z_step(V):
        lam, Q = jnp.linalg.eigh((V + V.T) / 2)
        lam = _project_simplex(lam)
        return (Q * lam) @ Q.T

    def body(s: _State):
        X = x_step(s.Z, s.U)
        Xr = alpha * X + (1.0 - alpha) * s.Z     # over-relaxation
        Z = z_step(Xr + s.U)
        U = s.U + Xr - Z
        r_prim = jnp.linalg.norm(X - Z)
        r_dual = rho * jnp.linalg.norm(Z - s.Z)
        eps_p = (params.eps_abs * n
                 + params.eps_rel * jnp.maximum(jnp.linalg.norm(X),
                                                jnp.linalg.norm(Z)))
        eps_d = params.eps_abs * n + params.eps_rel * jnp.linalg.norm(rho * U)
        done = (r_prim < eps_p) & (r_dual < eps_d)
        return _State(s.it + 1, X, Z, U, r_prim, r_dual, done)

    def cond(s: _State):
        return (~s.done) & (s.it < params.max_iters)

    Z0 = jnp.eye(n, dtype=dtype) / n
    init = _State(jnp.int32(0), Z0, Z0, jnp.zeros_like(M),
                  jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                  jnp.asarray(False))
    s = jax.lax.while_loop(cond, body, init)

    X = s.Z  # the PSD/trace-feasible iterate
    lam, Q = jnp.linalg.eigh(X)
    evec1 = Q[:, -1]
    pobj = jnp.sum(M * X)
    dobj = pobj - rho * s.r_prim  # surrogate gap estimate
    return X, lam, evec1, pobj, dobj, s.it


def solve_batched(Ms, Cs, params: Params = Params()) -> List[Solution]:
    """vmapped SDR solve over a batch of problems (B, n, n).

    The ADMM iteration (elementwise projections + batched eigh) vmaps
    cleanly; used for batched loop-closure cross-checking.
    """
    import time

    t0 = time.perf_counter()
    Ms = jnp.asarray(Ms)
    Cs = jnp.asarray(Cs, Ms.dtype)
    X, lam, evec1, pobj, dobj, iters = jax.vmap(
        lambda M, C: _admm(M, C, params))(Ms, Cs)
    X = np.asarray(X)
    lam = np.asarray(lam)
    evec1 = np.asarray(evec1)
    t1 = time.perf_counter()

    out = []
    for b in range(X.shape[0]):
        thr = float(np.abs(evec1[b]).max() / 2.0)
        nodes = [int(i) for i in np.flatnonzero(np.abs(evec1[b]) > thr)]
        out.append(Solution(X=X[b], lambdas=lam[b], evec1=evec1[b], thr=thr,
                            nodes=nodes, iters=int(iters[b]),
                            pobj=float(pobj[b]), dobj=float(dobj[b]),
                            t=t1 - t0, t_solve=t1 - t0))
    return out


def solve(M, C, params: Params = Params()) -> Solution:
    """Solve the MSRC SDR for dense symmetric M, C WITH identity diagonal
    (the reference passes getAffinityMatrix()/getConstraintMatrix() output —
    reference: src/clipper.cpp:103-104)."""
    import time

    t0 = time.perf_counter()
    M = jnp.asarray(M)
    C = jnp.asarray(C, M.dtype)
    X, lam, evec1, pobj, dobj, iters = _admm(M, C, params)

    X = np.asarray(X)
    t1 = time.perf_counter()
    lam = np.asarray(lam)
    evec1 = np.asarray(evec1)

    thr = float(np.abs(evec1).max() / 2.0)
    nodes = [int(i) for i in np.flatnonzero(np.abs(evec1) > thr)]
    t2 = time.perf_counter()

    return Solution(X=X, lambdas=lam, evec1=evec1, thr=thr, nodes=nodes,
                    iters=int(iters), pobj=float(pobj), dobj=float(dobj),
                    t=t2 - t0, t_solve=t1 - t0, t_extract=t2 - t1)
