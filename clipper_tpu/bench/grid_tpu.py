"""Monte-Carlo benchmark grid on device (reference: benchmarks/main.cpp:206-294).

Replicates the reference grid — m in {64, 256, 512, 1024, 2048} x outlier
ratio in {0, .2, .4, .8, .9}, 20 trials — but solves each grid cell's trials
as ONE pool-compacted device program (the TPU-native way to run Monte-Carlo
protocols; the pool engine keeps a slow straggler from stalling the whole
cell, which the lock-step batched engine suffered at m=2048/rho=0.4).
Reports per-problem end-to-end latency and mean precision/recall.

Low-outlier cells have cliques up to size m; the pool pipeline's polish
takes its in-graph exact-overflow branch (pool.exact_objective_rows) when a
converged support exceeds the top-k window, so omega rounding stays exact
at every rho.

Usage: python -m clipper_tpu.bench.grid_tpu [trials] [--engine=pool|batched]
Writes a markdown table to stdout.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from clipper_tpu import utils
    from clipper_tpu.bench import data, harness
    from clipper_tpu.parallel import batched, pool
    from clipper_tpu.types import Params

    args = sys.argv[1:]
    engine = "pool"
    for a in list(args):
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
            args.remove(a)
    trials = int(args[0]) if args else 20
    num_assocs = (64, 256, 512, 1024, 2048)
    outrats = (0.0, 0.2, 0.4, 0.8, 0.9)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    inv = harness.default_invariant()
    if engine == "pool":
        # headline config (round 5): flat-triangle storage + K=16 in-kernel
        # multiprobe for 128-divisible m — the multiprobe collapses the
        # m=2048 mid-rho backtracking tails (each tick evaluates a whole
        # alpha-decay chain); the m=64 cells take the stacked engine
        pipe_tri = pool.make_pool_pipeline(
            inv, Params(), storage_dtype=jnp.int8,
            lanes=min(trials, 128), window=2, power_steps=4,
            layout="tri", tri_probes=16, d_scale=0.15)
        pipe_stacked = pool.make_pool_pipeline(
            inv, Params(), storage_dtype=jnp.int8,
            lanes=min(trials, 128), window=12, power_steps=4)

        def pipe_for(m):
            return pipe_tri if m % 128 == 0 else pipe_stacked
    else:
        pipe = batched.make_batched_pipeline(inv, Params(), shared_d1=True,
                                             solver="flat",
                                             matvec="stacked_bf16")

        def pipe_for(m):
            return pipe

    print("| rho | m | end-to-end/problem [ms] | batch total [ms] | P [%] | R [%] |")
    print("|---|---|---|---|---|---|")
    rows = []
    for m in num_assocs:
        for rho in outrats:
            problems = [harness.make_problem(pcd0, m, rho, rng)
                        for _ in range(trials)]
            D1 = jnp.asarray(pcd0, jnp.float32)
            D2s = jnp.stack([jnp.asarray(p[0], jnp.float32)
                             for p in problems])
            As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
            key, sub = jax.random.split(key)
            u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
                jax.random.split(sub, trials))

            pipe = pipe_for(m)
            solns = pipe(D1, D2s, As, u0s)
            np.asarray(solns.score)  # compile + warm
            t0 = time.perf_counter()
            solns = pipe(D1, D2s, As, u0s)
            np.asarray(solns.score)
            dt = time.perf_counter() - t0

            masks = np.asarray(solns.mask)
            ps, rs = [], []
            for b, (_, A, Agt) in enumerate(problems):
                if Agt.size == 0:   # rho=0 grid cells always have inliers
                    continue
                p, r = data.get_precision_recall(A[masks[b]], Agt)
                ps.append(p)
                rs.append(r)
            row = (rho, m, dt / trials * 1e3, dt * 1e3,
                   float(np.mean(ps)) * 100, float(np.mean(rs)) * 100)
            rows.append(row)
            print(f"| {row[0]:.1f} | {row[1]} | {row[2]:.2f} | {row[3]:.1f} "
                  f"| {row[4]:.1f} | {row[5]:.1f} |", flush=True)
    return rows


if __name__ == "__main__":
    main()
