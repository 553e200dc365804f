"""Triangle-sharded engine bench: the m >= 200k capacity configuration.

Composition of symmetric-triangle tile storage with the device mesh
(ops/symstore.py solve_sharded_sym): total [M; C] bytes = m^2 + O(m t)
int8 split evenly over D devices — HALF of parallel/sharded.py's dense
stacked 2 m^2, so the committed demonstration point is a problem size whose
dense stacked storage cannot fit the machine at all. The reference's
ceiling being answered is one node's dense m x m double allocation
(reference: src/clipper.cpp:29).

Usage (direct on TPU, or via cpu_mesh_run for the virtual CPU mesh):
  python -m clipper_tpu.bench.cpu_mesh_run --devices=8 --bench=symshard \
      262144 1 --rho=0.97 --power=4
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

    argv = list(argv if argv is not None else sys.argv[1:])
    pos = [a for a in argv if not a.startswith("--")]
    m = int(pos[0]) if pos else 65536
    reps = int(pos[1]) if len(pos) > 1 else 1
    opts = dict(rho=0.96, probes=1, power=4, storage="int8",
                support=8192, build_chunk=64, mv_chunk=512)
    for a in argv:
        for k in ("rho", "probes", "power", "support", "build_chunk",
                  "mv_chunk"):
            if a.startswith(f"--{k.replace('_', '-')}="):
                v = a.split("=", 1)[1]
                opts[k] = float(v) if k == "rho" else int(v)
        if a.startswith("--storage="):
            opts["storage"] = a.split("=", 1)[1]

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.ops import symstore
    from jax.sharding import Mesh

    storage = {"int8": jnp.int8, "bf16": jnp.bfloat16,
               "f32": jnp.float32}[opts["storage"]]
    t = 128
    m_pad = -(-m // t) * t
    nt = m_pad // t
    D = len(jax.devices())
    T = nt * (nt + 1) // 2
    itemsize = jnp.dtype(storage).itemsize
    tri_gb = T * 2 * t * t * itemsize / 1e9
    dense_gb = 2 * m_pad * m_pad * itemsize / 1e9
    print(f"m={m} (pad {m_pad}, nt={nt}, T={T}) on {D} devices: "
          f"triangle {opts['storage']} = {tri_gb:.1f} GB total "
          f"({tri_gb / D:.2f} GB/device); dense stacked would be "
          f"{dense_gb:.1f} GB", flush=True)

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, Agt = harness.make_problem(pcd0, m, opts["rho"], rng)
    u0 = np.asarray(
        utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32))
    inv = harness.default_invariant()
    mesh = Mesh(np.array(jax.devices()), ("d",))

    times = []
    soln = None
    for rep in range(max(1, reps)):
        t0 = time.perf_counter()
        soln = symstore.solve_sharded_sym(
            inv, pcd0, pcd1.astype(np.float32), A, u0, mesh=mesh,
            storage_dtype=storage, probes=opts["probes"],
            power_steps=opts["power"], support=opts["support"],
            build_chunk=opts["build_chunk"], mv_chunk=opts["mv_chunk"])
        F = float(np.asarray(soln.score))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {rep}: {dt:.1f} s (incl. compile on rep 0)  F={F:.1f}",
              flush=True)
    mask = np.asarray(soln.mask)
    p, r = bdata.get_precision_recall(A[mask], Agt)
    print(f"m={m} D={D} {opts['storage']}: best {min(times):.1f} s  "
          f"inliers={int(mask.sum())}  P={p * 100:.1f}% R={r * 100:.1f}%",
          flush=True)
    return times


if __name__ == "__main__":
    main()
