"""Block-sparse (occupied-tile) storage benchmark on a structured scene.

The uniform-outlier bunny protocol fills every tile of M (density ~13% at
rho=0.9 spreads everywhere), so block-sparse storage cannot win there —
BENCH.md records the dense int8 stacked GEMV as the floor for that
workload. This benchmark measures the workload block-sparse storage exists
for: a MULTI-OBJECT scene where k rigid objects each move with their own
transform, so associations of object a are geometrically consistent only
with associations of object a — M is block-diagonal and ~(k-1)/k of its
tiles are exactly zero. The reference covers this axis with element-sparse
storage (reference: include/clipper/types.h:19-22); the TPU answer is tile
granularity (ops/blocksparse.py).

Measures, at matched solver flags (int8 storage, multiprobe K, power init):
  1. raw dual-matvec time: dense stacked [M; C] GEMM vs occupied-tile GEMM
  2. end-to-end flat solve of the scene (pipeline jitted once, storage
     passed as an argument — CLAUDE.md tunnel rules)
and reports the found clique's precision (vs the union ground truth) and
recall vs its own object (MSRC converges to the single densest clique; in
a multi-object scene that is one object — successive extraction peels the
rest, see examples).

Usage: python -m clipper_tpu.bench.blocksparse_bench [m] [k_objects] [reps]
       [--rho=0.9] [--probes=16] [--power=4] [--tile=256]
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np


def build_scene(pcd0, m, k, rho, rng):
    """k rigid objects, each its own motion: block-diagonal consistency.

    Object b reuses the bunny geometry but its target copy lives at a far
    offset (its own rigid motion), so cross-object association pairs have
    wildly different pairwise distances in source vs target -> affinity 0.

    Returns (D1, D2, A, gts) with A indexing (D1, D2) and gts a list of
    per-object ground-truth association arrays (global indices).
    """
    from clipper_tpu.bench import harness

    mb = m // k
    n1 = pcd0.shape[0]
    D2s, As, gts = [], [], []
    for b in range(k):
        pcd1, A, Agt = harness.make_problem(pcd0, mb, rho, rng)
        off = np.zeros(3, pcd0.dtype)
        off[b % 3] = 50.0 * (b + 1)
        D2s.append(pcd1 + off)
        A = A.copy()
        A[:, 1] += b * n1
        As.append(A)
        if Agt.size:
            Agt = Agt.copy()
            Agt[:, 1] += b * n1
        gts.append(Agt)
    return pcd0, np.concatenate(D2s), np.concatenate(As), gts


def main(argv=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.ops import blocksparse
    from clipper_tpu.ops.affinity import score_pairwise_consistency
    from clipper_tpu.solvers import msrc_flat
    from clipper_tpu.types import Params

    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("--")]
    m = int(pos[0]) if len(pos) > 0 else 8192
    k = int(pos[1]) if len(pos) > 1 else 8
    reps = int(pos[2]) if len(pos) > 2 else 5
    opts = dict(rho=0.9, probes=16, power=4, tile=256)
    for a in argv:
        if a.startswith("--"):
            key_, _, val = a[2:].partition("=")
            if key_ in opts:
                opts[key_] = type(opts[key_])(val)

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    D1, D2, A, gts = build_scene(pcd0, m, k, opts["rho"], rng)
    m = A.shape[0]  # k may not divide the requested m
    inv = harness.default_invariant()

    # dense affinity build on device (XLA), pulled host-side for tiling
    score = jax.jit(lambda D1, D2, A: score_pairwise_consistency(
        inv, D1, D2, A, affinityeps=1e-4))
    M, C = score(jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(A, jnp.int32))
    M = np.asarray(M)
    C = np.asarray(C)

    bs, info = blocksparse.from_dense(M, C, tile=opts["tile"],
                                      storage_dtype=jnp.int8)
    _, dense_info = blocksparse.from_dense(M, C, tile=opts["tile"],
                                           storage_dtype=jnp.int8,
                                           max_occupancy=-1.0)
    MC = dense_info["dense"]
    assert bs is not None, (
        f"scene not block-sparse (occupancy {info['occupancy']:.2f}) — "
        "raise k or check offsets")
    m_pad = info["m_pad"]
    nt = info["nt"]
    dense_bytes = int(np.prod(MC.shape))
    tile_bytes = int(np.prod(bs.tiles.shape))
    print(f"m={m} (pad {m_pad}) k={k} tile={opts['tile']}: occupancy "
          f"{info['occupancy'] * 100:.1f}% ({info['n_tiles']}/{nt * nt} "
          f"tiles), storage {tile_bytes / 1e6:.1f} MB vs dense "
          f"{dense_bytes / 1e6:.1f} MB", flush=True)

    u0 = jnp.pad(utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32),
                 (0, m_pad - m))
    K = opts["probes"]

    # --- raw dual-matvec microbenchmark (the solver tick's hot op).
    # A single call through the remote tunnel is dispatch-dominated
    # (~20-50 ms/call), so chain ITERS applications inside one jitted
    # fori_loop and report per-application time.
    U = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, K), jnp.float32)
    ITERS = 32

    def make_chain(make_mv):
        @jax.jit
        def f(storage, U):
            mv = make_mv(storage)

            def body(_, U):
                MU, CU = mv(U)
                s = jnp.sqrt(jnp.sum(MU * MU, axis=0, keepdims=True)) + 1e-3
                return MU / s + 1e-6 * CU

            return jax.lax.fori_loop(0, ITERS, body, U)
        return f

    mv_dense = make_chain(
        lambda MC: msrc_flat.make_stacked_matvec(MC, jnp.float32))
    mv_block = make_chain(
        lambda bs: blocksparse.make_matvec(bs, nt, jnp.float32))

    def best(f, *args):
        np.asarray(f(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / ITERS

    t_mv_d = best(mv_dense, MC, U)
    t_mv_b = best(mv_block, bs, U)
    print(f"dual matvec (K={K}, per tick of a {ITERS}-chain): "
          f"dense int8 {t_mv_d * 1e3:7.3f} ms | "
          f"block-sparse int8 {t_mv_b * 1e3:7.3f} ms | "
          f"{t_mv_d / t_mv_b:.2f}x", flush=True)

    # --- end-to-end flat solve, storage passed as an argument
    params = Params()

    def _solve(mv, u0):
        u0 = msrc_flat.power_init(mv, u0, opts["power"])
        return msrc_flat.flat_solve_single_multiprobe(mv, u0, params,
                                                      probes=K)

    @jax.jit
    def solve_dense(MC, u0):
        return _solve(msrc_flat.make_stacked_matvec(MC, u0.dtype), u0)

    @jax.jit
    def solve_block(bs, u0):
        return _solve(blocksparse.make_matvec(bs, nt, u0.dtype), u0)

    def best_solve(f, *args):
        u, F, _ = f(*args)
        np.asarray(F)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            u, F, _ = f(*args)
            np.asarray(F)
            ts.append(time.perf_counter() - t0)
        return min(ts), np.asarray(u)[:m]

    t_d, u_d = best_solve(solve_dense, MC, u0)
    t_b, u_b = best_solve(solve_block, bs, u0)

    def quality(u):
        # exact f32 support polish + omega rounding, host-side (untimed);
        # degenerate runs (empty support / no ground truth at extreme rho)
        # report P=R=0 instead of crashing
        s = u > 0
        gt_nonempty = [g for g in gts if g.size]
        if not s.any() or not gt_nonempty:
            return 0.0, 0.0
        un = u[s] / np.linalg.norm(u[s])
        F = float(un @ M[np.ix_(s, s)] @ un)
        omega = int(np.floor(F + 0.5)) + 1
        idx = np.argsort(-u)[:omega]
        Ain = A[idx]
        gt_all = np.concatenate(gt_nonempty)
        p, _ = bdata.get_precision_recall(Ain, gt_all)
        r_best = max(bdata.get_precision_recall(Ain, g)[1]
                     for g in gt_nonempty)
        return p, r_best

    for name, t, u in (("dense int8", t_d, u_d),
                       ("block-sparse int8", t_b, u_b)):
        p, r = quality(u)
        print(f"solve ({name:17s}): {t * 1e3:8.1f} ms  "
              f"P={p * 100:.1f}% R(won object)={r * 100:.1f}%", flush=True)
    print(f"end-to-end solve speedup: {t_d / t_b:.2f}x at occupancy "
          f"{info['occupancy'] * 100:.1f}%")


if __name__ == "__main__":
    main()
