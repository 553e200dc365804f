"""Mixed problem-size benchmark: bucketed batching vs homogeneous batches.

Real association queues mix m; the check here is that a problem's cost in a
mixed workload tracks its OWN size bucket (pad-to-bucket, one pool pipeline
per bucket — parallel/buckets.py), not the workload's max m.

Usage: python -m clipper_tpu.bench.mixed_bench [W_per_size] [reps]
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
    from clipper_tpu.parallel import buckets
    from clipper_tpu.types import Params

    argv = argv if argv is not None else sys.argv[1:]
    Wp = int(argv[0]) if len(argv) > 0 else 32
    reps = int(argv[1]) if len(argv) > 1 else 3
    sizes = (256, 512, 1024, 2048)
    rho = 0.9

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny().astype(np.float32)

    def make(m):
        pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
        nonlocal key
        key, sub = jax.random.split(key)
        u0 = np.asarray(utils.randvec(sub, m, dtype=jnp.float32))
        return (pcd1.astype(np.float32), A.astype(np.int32), u0), Agt

    workload, gts = [], []
    for m in sizes:
        for _ in range(Wp):
            p, Agt = make(m)
            workload.append(p)
            gts.append(Agt)
    order = rng.permutation(len(workload))
    workload = [workload[i] for i in order]
    gts = [gts[i] for i in order]

    inv = harness.default_invariant()
    kw = dict(storage_dtype=jnp.int8, power_steps=4, window=12)

    bp = buckets.make_bucketed_pipeline(inv, Params(), **kw)
    D1 = jnp.asarray(pcd0)

    solns = bp(D1, workload)                     # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        solns = bp(D1, workload)                 # returns host arrays
        times.append(time.perf_counter() - t0)
    t_mixed = min(times)

    ps, rs = [], []
    for s, (_, A, _), Agt in zip(solns, workload, gts):
        p, r = bdata.get_precision_recall(A[np.asarray(s.mask)], Agt)
        ps.append(p)
        rs.append(r)
    n = len(workload)
    print(f"mixed workload: {n} problems (m in {sizes}, {Wp} each), "
          f"{t_mixed * 1e3:.1f} ms total = {t_mixed / n * 1e3:.3f} ms/problem"
          f"  P={np.mean(ps) * 100:.1f}% R={np.mean(rs) * 100:.1f}%",
          flush=True)

    # homogeneous reference: each size batched alone through the same engine
    total_homo = 0.0
    for m in sizes:
        probs = [w for w in workload if w[1].shape[0] == m]
        solns = bp(D1, probs)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            solns = bp(D1, probs)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        total_homo += dt
        print(f"  homogeneous m={m:5d}: {dt * 1e3:8.1f} ms for {len(probs)} "
              f"-> {dt / len(probs) * 1e3:.3f} ms/problem", flush=True)
    print(f"mixed / sum-of-homogeneous = {t_mixed / total_homo:.2f} "
          f"(1.0 = zero heterogeneity penalty)")


if __name__ == "__main__":
    main()
