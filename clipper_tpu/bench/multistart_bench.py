"""Multistart overhead benchmark: K restarts per problem via shared lanes.

The PGA solver is a local method; the reference documents u0 sensitivity and
leaves restarts to the caller (reference: clipper.h:44-47). The pool engine
makes K-way multistart a scheduling problem instead of K solver runs: the K
restarts are extra pool lanes sharing the problem's stored [M; C]
(parallel/pool.py::make_pool_multistart_pipeline), and restart selection is
a top-k support polish, not a full affinity rebuild.

Measures single-start vs K-restart per-problem cost at matched flags, plus
the P/R delta restarts buy.

Usage: python -m clipper_tpu.bench.multistart_bench [W] [K] [reps]
       [--m=1024] [--rho=0.9]
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.parallel import pool
    from clipper_tpu.types import Params

    argv = argv if argv is not None else sys.argv[1:]
    pos = [a for a in argv if not a.startswith("--")]
    W = int(pos[0]) if len(pos) > 0 else 128
    K = int(pos[1]) if len(pos) > 1 else 4
    reps = int(pos[2]) if len(pos) > 2 else 3
    m, rho = 1024, 0.9
    for a in argv:
        if a.startswith("--m="):
            m = int(a.split("=", 1)[1])
        elif a.startswith("--rho="):
            rho = float(a.split("=", 1)[1])

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    problems = [harness.make_problem(pcd0, m, rho, rng) for _ in range(W)]
    D1 = jnp.asarray(pcd0)
    D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    keys = jax.random.split(jax.random.PRNGKey(0), W * K).reshape(W, K, 2)
    u0s = jax.vmap(jax.vmap(lambda k: utils.randvec(k, m,
                                                    dtype=jnp.float32)))(keys)

    inv = harness.default_invariant()
    kw = dict(storage_dtype=jnp.int8, power_steps=4, window=12,
              lanes=min(128, W))

    def run(pipe, u0):
        solns = pipe(D1, D2s, As, u0)
        np.asarray(solns.score)  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            solns = pipe(D1, D2s, As, u0)
            np.asarray(solns.score)
            ts.append(time.perf_counter() - t0)
        masks = np.asarray(solns.mask)
        ps, rs = [], []
        for b, (_, A, Agt) in enumerate(problems):
            p, r = bdata.get_precision_recall(np.asarray(A)[masks[b]], Agt)
            ps.append(p)
            rs.append(r)
        return min(ts), np.mean(ps), np.mean(rs)

    single = pool.make_pool_pipeline(inv, Params(), **kw)
    t1, p1, r1 = run(single, u0s[:, 0])
    print(f"single-start  : {t1 * 1e3:8.1f} ms for W={W} -> "
          f"{t1 / W * 1e3:.3f} ms/problem  P={p1 * 100:.1f}% "
          f"R={r1 * 100:.1f}%", flush=True)

    multi = pool.make_pool_multistart_pipeline(inv, Params(), restarts=K,
                                               **kw)
    tK, pK, rK = run(multi, u0s)
    print(f"multistart K={K}: {tK * 1e3:8.1f} ms for W={W} -> "
          f"{tK / W * 1e3:.3f} ms/problem  P={pK * 100:.1f}% "
          f"R={rK * 100:.1f}%", flush=True)
    print(f"multistart / single per-problem cost: {tK / t1:.2f}x "
          f"(naive K runs = {K}.00x)")


if __name__ == "__main__":
    main()
