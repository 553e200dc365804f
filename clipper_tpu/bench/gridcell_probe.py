"""Per-stage timing of one Monte-Carlo grid cell (the m=2048 rho=0.4 probe).

The committed grid (BENCH.md round 3) shows m=2048 rho=0.4 at ~2x the
per-problem cost of its rho=0.8/0.9 neighbors; tick statistics alone
(bench.tickstats) show similar max tick counts (169 vs 137), so this tool
splits the pool pipeline into its three dispatches (build / pool solve /
polish) and reports each stage's time plus the pool's executed window
count, per rho.

Usage: python -m clipper_tpu.bench.gridcell_probe [trials] [m] \
           [--rhos=0,0.4,0.8,0.9]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None):
    import pathlib

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("--")]
    W = int(pos[0]) if pos else 20
    m = int(pos[1]) if len(pos) > 1 else 2048
    rhos = [0.0, 0.4, 0.8, 0.9]
    for a in argv:
        if a.startswith("--rhos="):
            rhos = [float(x) for x in a.split("=", 1)[1].split(",")]

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.parallel import pool
    from clipper_tpu.solvers import msrc_flat
    from clipper_tpu.types import Params

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    inv = harness.default_invariant()
    D1 = jnp.asarray(pcd0, jnp.float32)

    # the same engine/config as bench.grid_tpu, but with the stages
    # dispatched separately (fused=False) so each is timed on its own
    pipe_parts = pool.make_pool_pipeline(
        inv, Params(), storage_dtype=jnp.int8, lanes=128, window=12,
        power_steps=4, fused=False)
    # stage handles for manual timing
    build_jit = None  # filled per call below via the module internals

    for rho in rhos:
        problems = [harness.make_problem(pcd0, m, rho, rng)
                    for _ in range(W)]
        D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
        As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
        u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
            jax.random.split(key, W))

        # warm (compile) once via the public pipeline
        solns = pipe_parts(D1, D2s, As, u0s)
        np.asarray(solns.score)

        # manual staged run with the same internals
        from clipper_tpu.ops.affinity import score_consistency_stored

        @jax.jit
        def build(D2s, As, u0s):
            def one(D2, A, u0):
                MC = score_consistency_stored(inv, D1, D2, A,
                                              affinityeps=1e-4,
                                              storage_dtype=jnp.int8)
                mv = msrc_flat.make_stacked_matvec(MC, u0.dtype)
                u0p = msrc_flat.power_init(mv, u0, 4)
                return MC, msrc_flat.flat_init(mv, u0p, Params())
            return jax.vmap(one)(D2s, As, u0s)

        @jax.jit
        def solve(MCs, inits):
            return pool.solve_pool(MCs, inits, Params(), lanes=128,
                                   window=12, return_windows=True)

        MCs, inits = build(D2s, As, u0s)
        jax.block_until_ready(MCs)
        t0 = time.perf_counter()
        MCs, inits = build(D2s, As, u0s)
        np.asarray(inits.F[:1])
        t_build = time.perf_counter() - t0

        u, F, ifin, nwin = solve(MCs, inits)
        np.asarray(F[:1])
        t0 = time.perf_counter()
        u, F, ifin, nwin = solve(MCs, inits)
        np.asarray(F[:1])
        t_solve = time.perf_counter() - t0

        t0 = time.perf_counter()
        solns = pipe_parts(D1, D2s, As, u0s)
        np.asarray(solns.score)
        t_total = time.perf_counter() - t0

        nnz = np.asarray((np.asarray(u) > 0).sum(axis=1))
        ps, rs = [], []
        masks = np.asarray(solns.mask)
        for b, (_, A, Agt) in enumerate(problems):
            if Agt.size:
                p_, r_ = bdata.get_precision_recall(A[masks[b]], Agt)
                ps.append(p_)
                rs.append(r_)
        print(f"rho={rho:4.2f}: build {t_build*1e3:7.1f} ms  "
              f"solve {t_solve*1e3:7.1f} ms ({int(nwin)} windows)  "
              f"pipeline-total {t_total*1e3:7.1f} ms  "
              f"polish+rest {max(0.0, t_total-t_build-t_solve)*1e3:6.1f} ms  "
              f"max-nnz {nnz.max()}  "
              f"P={np.mean(ps)*100 if ps else 100:.1f}% "
              f"R={np.mean(rs)*100 if rs else 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
