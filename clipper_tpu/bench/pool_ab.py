"""Pool-engine A/B driver: storage layouts x line-search configs.

The measurement harness behind BENCH.md round 5's headline table — runs
the full fused pipeline (build + compacted solve + polish) for each named
configuration on the same W-problem workload and reports end-to-end
throughput and P/R. Timing follows CLAUDE.md's tunnel rules: warm first,
then best-of-reps with a forced host fetch.

Usage:
  python -m clipper_tpu.bench.pool_ab [W] [--m=1024] [--rho=0.9] \
      [--configs=stacked,tri-k16]

Named configs: stacked (round-4 engine), tri (flat-triangle K=1),
tri-k8 / tri-k16 (in-kernel multiprobe), tri-k16-ds (committed headline:
K=16 + d_scale=0.15).
"""

from __future__ import annotations

import sys
import time

import numpy as np

CONFIGS = {
    "stacked": dict(layout="stacked", window=12),
    "tri": dict(layout="tri", tri_probes=1, window=12),
    "tri-k8": dict(layout="tri", tri_probes=8, window=6),
    "tri-k16": dict(layout="tri", tri_probes=16, window=2),
    "tri-k16-ds": dict(layout="tri", tri_probes=16, window=2,
                       d_scale=0.15),
}


def main(argv=None):
    import pathlib

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from clipper_tpu import utils
    from clipper_tpu.bench import data, harness
    from clipper_tpu.parallel import pool
    from clipper_tpu.types import Params

    argv = list(argv if argv is not None else sys.argv[1:])
    pos = [a for a in argv if not a.startswith("--")]
    W = int(pos[0]) if pos else 512
    m, rho = 1024, 0.9
    names = list(CONFIGS)
    for a in argv:
        if a.startswith("--m="):
            m = int(a.split("=", 1)[1])
        elif a.startswith("--rho="):
            rho = float(a.split("=", 1)[1])
        elif a.startswith("--configs="):
            names = a.split("=", 1)[1].split(",")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    pcd0 = harness.load_bunny()
    problems = [harness.make_problem(pcd0, m, rho, rng) for _ in range(W)]
    D1 = jnp.asarray(pcd0, jnp.float32)
    D2s = jnp.stack([jnp.asarray(p[0], jnp.float32) for p in problems])
    As = jnp.stack([jnp.asarray(p[1], jnp.int32) for p in problems])
    u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=jnp.float32))(
        jax.random.split(key, W))
    inv = harness.default_invariant()

    print("| config | ms/batch | problems/s | P [%] | R [%] |")
    print("|---|---|---|---|---|")
    for name in names:
        kw = dict(CONFIGS[name])
        pipe = pool.make_pool_pipeline(inv, Params(), lanes=128,
                                       storage_dtype=jnp.int8,
                                       power_steps=4, chunk=128, **kw)
        s = pipe(D1, D2s, As, u0s)
        np.asarray(s.score)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s = pipe(D1, D2s, As, u0s)
            np.asarray(s.score)
            best = min(best, time.perf_counter() - t0)
        masks = np.asarray(s.mask)
        ps, rs = [], []
        for b, (_, A, Agt) in enumerate(problems):
            p, r = data.get_precision_recall(A[masks[b]], Agt)
            ps.append(p)
            rs.append(r)
        print(f"| {name} | {best * 1e3:.1f} | {W / best:.0f} | "
              f"{np.mean(ps) * 100:.1f} | {np.mean(rs) * 100:.1f} |",
              flush=True)


if __name__ == "__main__":
    main()
