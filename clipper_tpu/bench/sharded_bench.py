"""Sharded-engine scaling benchmark (multi-device).

Measures single-problem solve throughput for large m as a function of mesh
shape — the n >= 100k distributed loop-closure screening config. On a
single-chip machine this only exercises the (1, 1) mesh; on a pod slice it
reports weak/strong scaling efficiency over ICI.

Usage: python -m clipper_tpu.bench.sharded_bench [m] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from clipper_tpu import utils
    from clipper_tpu.bench import harness
    from clipper_tpu.parallel import sharded
    from clipper_tpu.types import Params

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    ndev = len(jax.devices())
    shapes = []
    r = 1
    while r * r <= ndev:
        if ndev % r == 0:
            shapes.append((r, ndev // r))
        r += 1
    if not shapes:
        shapes = [(1, ndev)]

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny()
    pcd1, A, Agt = harness.make_problem(pcd0, m, 0.9, rng)
    u0 = np.asarray(
        utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32))
    inv = harness.default_invariant()

    results = {}
    for shape in shapes:
        mesh = sharded.make_mesh(shape)
        soln = sharded.solve_sharded(inv, pcd0.astype(np.float32),
                                     pcd1.astype(np.float32), A, u0,
                                     Params(), mesh)
        np.asarray(soln.score)  # warmup + compile
        t0 = time.perf_counter()
        for _ in range(reps):
            soln = sharded.solve_sharded(inv, pcd0.astype(np.float32),
                                         pcd1.astype(np.float32), A, u0,
                                         Params(), mesh)
            np.asarray(soln.score)
        dt = (time.perf_counter() - t0) / reps
        results[shape] = dt
        print(f"mesh {shape}: {dt*1e3:9.1f} ms/solve  F={float(soln.score):.2f}")

    base = results[shapes[0]]
    for shape, dt in results.items():
        ndev_used = shape[0] * shape[1]
        eff = base / (dt * ndev_used / (shapes[0][0] * shapes[0][1]))
        print(f"mesh {shape}: scaling efficiency vs {shapes[0]}: {eff:.2f}")


if __name__ == "__main__":
    main()
