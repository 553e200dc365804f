"""Diagnose the flat solver's tick composition on the headline workload.

Prints per-lane probe counts split into accepted steps vs line-search
backtracks, plus the longest-lane stats that set the batch's device time.
Run on TPU:  python -m clipper_tpu.bench.tickstats [B] [m] [rho] \
                 [--power=0] [--storage=bf16|int8|f32]
(m/rho/power/storage let the tool point at any grid cell, e.g. the
m=2048 rho=0.4 outlier — BENCH.md round 4.)
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/clipper_tpu_jax_cache")

    from clipper_tpu import utils
    from clipper_tpu.bench import harness
    from clipper_tpu.ops.affinity import score_pairwise_consistency
    from clipper_tpu.solvers import msrc_flat
    from clipper_tpu.types import Params

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(pos[0]) if pos else 128
    m = int(pos[1]) if len(pos) > 1 else 1024
    rho = float(pos[2]) if len(pos) > 2 else 0.9
    power = 0
    storage = "bf16"
    for a in sys.argv[1:]:
        if a.startswith("--power="):
            power = int(a.split("=", 1)[1])
        elif a.startswith("--storage="):
            storage = a.split("=", 1)[1]
    sdt = {"bf16": jnp.bfloat16, "int8": jnp.int8, "f32": None}[storage]
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    problems = [harness.make_problem(pcd0, m, rho, rng) for _ in range(B)]
    D1 = jnp.asarray(pcd0, dtype)
    D2s = jnp.stack([jnp.asarray(p[0], dtype) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=dtype))(
        jax.random.split(key, B))
    inv = harness.default_invariant()
    params = Params()

    @jax.jit
    @jax.vmap
    def run(D2, A, u0):
        M, C = score_pairwise_consistency(inv, D1, D2, A, affinityeps=1e-4)
        mv = msrc_flat.stacked_dual_matvec(M, C, sdt)
        if power:
            u0 = msrc_flat.power_init(mv, u0, power)
        u, F, i, ticks, nback = msrc_flat.flat_solve_single(
            mv, u0, params, return_ticks=True)
        return i, ticks, nback

    i, ticks, nback = jax.tree.map(np.asarray, run(D2s, As, u0s))
    acc = ticks - nback
    for name, x in [("ticks", ticks), ("accepts", acc), ("backtracks", nback),
                    ("outer i", i)]:
        q = np.percentile(x, [50, 90, 99])
        print(f"{name:10s} mean={x.mean():7.1f} med={q[0]:6.0f} "
              f"p90={q[1]:6.0f} p99={q[2]:6.0f} max={x.max():6d}")
    print(f"sum ticks={ticks.sum()} device lane-ticks={B * ticks.max()} "
          f"utilization={ticks.sum() / (B * ticks.max()) * 100:.1f}%")
    # the lane that sets the batch time: what is it doing?
    w = int(np.argmax(ticks))
    print(f"slowest lane: ticks={ticks[w]} accepts={acc[w]} "
          f"backtracks={nback[w]} outer={i[w]}")


if __name__ == "__main__":
    main()
