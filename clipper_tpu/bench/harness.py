"""Monte-Carlo registration benchmark harness.

Replicates the reference benchmark protocol (reference: benchmarks/main.cpp):
bun10k scaled to the unit cube, bounded normal noise (sigma=0.01,
beta=5.54*sigma), GT = mutual 1-NN within beta, Euclidean invariant with
sigma=0.015 / epsilon=0.05, grid over m x outlier-ratio with Monte-Carlo
trials, reporting affinity-build time, solver time, precision, and recall.

Adds TPU-native measurement modes the reference lacks: batched (vmap) trials
where one device solves a whole grid cell's trials at once.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clipper_tpu import utils
from clipper_tpu.bench import data
from clipper_tpu.invariants.euclidean import EuclideanDistance, EuclideanDistanceParams
from clipper_tpu.ops.affinity import score_pairwise_consistency
from clipper_tpu.solvers import msrc
from clipper_tpu.types import Params

NOISE_SIGMA = 0.01
NOISE_BETA = 5.54 * NOISE_SIGMA
INV_SIGMA = 0.015
INV_EPSILON = 0.05


@dataclasses.dataclass
class Trial:
    t_affinity: float = 0.0
    t_solver: float = 0.0
    p: float = 0.0
    r: float = 0.0


def default_invariant() -> EuclideanDistance:
    return EuclideanDistance(EuclideanDistanceParams(
        sigma=INV_SIGMA, epsilon=INV_EPSILON))


def load_bunny() -> np.ndarray:
    return data.scale_to_cube(data.read_ply(data.BUN10K), 1.0)


def make_problem(pcd0: np.ndarray, m: int, rho: float,
                 rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray, np.ndarray]:
    """One synthetic registration problem: (pcd1, A, Agt)."""
    eta = data.generate_bounded_normal_noise(rng, pcd0.shape[0],
                                             NOISE_SIGMA, NOISE_BETA)
    pcd1 = pcd0 + eta
    Agt0 = data.distance_based_correspondences(pcd0, pcd1, 1, NOISE_BETA, True)
    A, Agt = data.generate_synthetic_correspondences(
        rng, pcd0.shape[0], pcd1.shape[0], Agt0, m, rho)
    return pcd1, A, Agt


@jax.jit
def _pipeline(D1, D2, A, u0):
    """Jitted end-to-end step: affinity build + MSRC solve + rounding."""
    inv = default_invariant()
    M, C = score_pairwise_consistency(inv, D1, D2, A, affinityeps=1e-4)
    return msrc.solve_msrc(M, C, u0, Params())


def run_trial(pcd0: np.ndarray, m: int, rho: float,
              rng: np.random.Generator, key: jax.Array,
              dtype=jnp.float32) -> Trial:
    """One Monte-Carlo trial (timing mirrors reference main.cpp:176-193)."""
    trial = Trial()
    pcd1, A, Agt = make_problem(pcd0, m, rho, rng)

    inv = default_invariant()
    D1 = jnp.asarray(pcd0, dtype)
    D2 = jnp.asarray(pcd1, dtype)
    Aj = jnp.asarray(A, jnp.int32)
    u0 = utils.randvec(key, m, dtype=dtype)

    score_jit = jax.jit(lambda D1, D2, A: score_pairwise_consistency(
        inv, D1, D2, A, affinityeps=1e-4))
    solve_jit = jax.jit(lambda M, C, u0: msrc.solve_msrc(M, C, u0, Params()))

    # warmup (compile)
    M, C = score_jit(D1, D2, Aj)
    M.block_until_ready()
    t0 = time.perf_counter()
    M, C = score_jit(D1, D2, Aj)
    M.block_until_ready()
    trial.t_affinity = time.perf_counter() - t0

    soln = solve_jit(M, C, u0)
    soln.mask.block_until_ready()
    t0 = time.perf_counter()
    soln = solve_jit(M, C, u0)
    soln.mask.block_until_ready()
    trial.t_solver = time.perf_counter() - t0

    Ain = A[np.asarray(soln.mask)]
    trial.p, trial.r = data.get_precision_recall(Ain, Agt)
    return trial


# ----------------------------------------------------------------------------
# point-normal (plane / surfel) scan-alignment config: heavier affinity build
# (BASELINE.json config 3: n=5k associations)
# ----------------------------------------------------------------------------


def make_pointnormal_problem(rng: np.random.Generator, n: int = 2000,
                             m: int = 5000, rho: float = 0.8,
                             noise: float = 0.01):
    """Synthetic surfel-cloud alignment: points + unit normals under a random
    rigid transform, with outlier association injection.

    Returns (D1, D2, A, Agt): (n, 6) point-normal datasets, (m, 2) putative
    associations (outliers first), GT inlier subset.
    """
    pts = rng.uniform(-5.0, 5.0, size=(n, 3))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    # random rotation (QR of gaussian) + translation
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    t = rng.uniform(-2, 2, size=3)
    pts2 = pts @ Q.T + t + rng.normal(0, noise, size=(n, 3))
    nrm2 = nrm @ Q.T

    D1 = np.concatenate([pts, nrm], axis=1)
    D2 = np.concatenate([pts2, nrm2], axis=1)
    Agood = np.stack([np.arange(n), np.arange(n)], axis=1).astype(np.int32)
    A, Agt = data.generate_synthetic_correspondences(rng, n, n, Agood, m, rho)
    return D1, D2, A, Agt


def run_pointnormal_trial(rng: np.random.Generator, key: jax.Array,
                          n: int = 2000, m: int = 5000, rho: float = 0.8,
                          dtype=jnp.float32) -> Trial:
    """One point-normal trial with affinity/solver timing (m=5k default)."""
    from clipper_tpu.invariants.pointnormal import (
        PointNormalDistance, PointNormalDistanceParams)

    trial = Trial()
    D1, D2, A, Agt = make_pointnormal_problem(rng, n, m, rho)
    inv = PointNormalDistance(PointNormalDistanceParams(
        sigp=0.03, epsp=0.06, sign=0.05, epsn=0.15))
    D1j, D2j = jnp.asarray(D1, dtype), jnp.asarray(D2, dtype)
    Aj = jnp.asarray(A, jnp.int32)
    u0 = utils.randvec(key, m, dtype=dtype)

    score_jit = jax.jit(lambda D1, D2, A: score_pairwise_consistency(
        inv, D1, D2, A, affinityeps=1e-4))
    solve_jit = jax.jit(lambda M, C, u0: msrc.solve_msrc(M, C, u0, Params()))

    M, C = score_jit(D1j, D2j, Aj)
    np.asarray(M[0, 0])
    t0 = time.perf_counter()
    M, C = score_jit(D1j, D2j, Aj)
    np.asarray(M[0, 0])
    trial.t_affinity = time.perf_counter() - t0

    soln = solve_jit(M, C, u0)
    np.asarray(soln.score)
    t0 = time.perf_counter()
    soln = solve_jit(M, C, u0)
    np.asarray(soln.score)
    trial.t_solver = time.perf_counter() - t0

    Ain = A[np.asarray(soln.mask)]
    trial.p, trial.r = data.get_precision_recall(Ain, Agt)
    return trial


# ----------------------------------------------------------------------------
# batched engine measurement: B independent problems solved at once via vmap
# ----------------------------------------------------------------------------


def run_batched(pcd0: np.ndarray, m: int, rho: float, batch: int,
                rng: np.random.Generator, key: jax.Array,
                dtype=jnp.float32, n_timing_reps: int = 3,
                solver: str = "flat", matvec: str = "stacked"):
    """Solve `batch` independent problems in one vmapped device program.

    Returns (throughput_problems_per_s, mean_precision, mean_recall,
    elapsed_s) where elapsed covers affinity build + solve + rounding for the
    whole batch (compile/warmup excluded).
    """
    from clipper_tpu.parallel import batched as batched_mod

    problems = [make_problem(pcd0, m, rho, rng) for _ in range(batch)]
    D1 = jnp.asarray(pcd0, dtype)
    D2s = jnp.stack([jnp.asarray(p[0], dtype) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=dtype))(
        jax.random.split(key, batch))

    batch_pipeline = batched_mod.make_batched_pipeline(
        default_invariant(), Params(), shared_d1=True, solver=solver,
        matvec=matvec)

    solns = batch_pipeline(D1, D2s, As, u0s)  # compile + warmup
    np.asarray(solns.score)

    t0 = time.perf_counter()
    for _ in range(n_timing_reps):
        solns = batch_pipeline(D1, D2s, As, u0s)
        np.asarray(solns.score)
    elapsed = (time.perf_counter() - t0) / n_timing_reps

    masks = np.asarray(solns.mask)
    ps, rs = [], []
    for b, (_, A, Agt) in enumerate(problems):
        p, r = data.get_precision_recall(A[masks[b]], Agt)
        ps.append(p)
        rs.append(r)
    return batch / elapsed, float(np.mean(ps)), float(np.mean(rs)), elapsed


def run_grid(num_assocs=(64, 256, 512, 1024, 2048),
             outrats=(0.0, 0.2, 0.4, 0.8, 0.9),
             n_trials: int = 20, seed: int = 0,
             dtype=jnp.float32, verbose: bool = True) -> List[dict]:
    """The reference's full Monte-Carlo grid (reference: main.cpp:206-294)."""
    pcd0 = load_bunny()
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    rows = []
    for rho in outrats:
        for m in num_assocs:
            trials = []
            for t in range(n_trials):
                key, sub = jax.random.split(key)
                trials.append(run_trial(pcd0, m, rho, rng, sub, dtype))
            row = dict(
                rho=rho, m=m,
                t_affinity_ms=1e3 * float(np.mean([t.t_affinity for t in trials])),
                t_solver_ms=1e3 * float(np.mean([t.t_solver for t in trials])),
                precision=float(np.mean([t.p for t in trials])),
                recall=float(np.mean([t.r for t in trials])),
            )
            rows.append(row)
            if verbose:
                print(f"rho={rho:.1f} m={m:5d}  affinity={row['t_affinity_ms']:8.2f}ms"
                      f"  solver={row['t_solver_ms']:8.2f}ms"
                      f"  P={row['precision']*100:5.1f}%  R={row['recall']*100:5.1f}%")
    return rows
