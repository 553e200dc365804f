"""Sharded-engine scaling benchmark — the m >= 65k single-huge-problem config.

The reference's hard ceiling is one node's memory for the dense m x m double
matrix (reference: src/clipper.cpp:29); this benchmark demonstrates the
sharded engine past it: block-distributed reduced-precision [M; C] storage,
chunked on-device affinity build, collective matvec, and strong scaling over
mesh shapes.

Timing protocol: the pipeline is built (jitted) ONCE per mesh shape and the
jitted call is timed by fetching the score (through the remote tunnel,
block_until_ready can return early — see CLAUDE.md).

Usage:
  python -m clipper_tpu.bench.sharded_bench [m] [reps] \
      [--storage=int8|bf16|none] [--probes=K] [--power=N] [--rho=0.9] \
      [--mesh=RxC ...] [--build-chunk=512]

With no --mesh, all (r, c) factorizations of the device count are swept and
a strong-scaling efficiency table is printed.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _parse_args(argv):
    m, reps = 8192, 3
    pos = [a for a in argv if not a.startswith("--")]
    if len(pos) > 0:
        m = int(pos[0])
    if len(pos) > 1:
        reps = int(pos[1])
    opts = dict(storage="int8", probes=16, power=4, rho=0.9,
                meshes=None, build_chunk=512, matvec_chunk=None)
    for a in argv:
        if a.startswith("--storage="):
            opts["storage"] = a.split("=", 1)[1]
        elif a.startswith("--matvec-chunk="):
            opts["matvec_chunk"] = int(a.split("=", 1)[1])
        elif a.startswith("--probes="):
            opts["probes"] = int(a.split("=", 1)[1])
        elif a.startswith("--power="):
            opts["power"] = int(a.split("=", 1)[1])
        elif a.startswith("--rho="):
            opts["rho"] = float(a.split("=", 1)[1])
        elif a.startswith("--build-chunk="):
            opts["build_chunk"] = int(a.split("=", 1)[1])
        elif a.startswith("--mesh="):
            r, c = a.split("=", 1)[1].lower().split("x")
            opts.setdefault("mesh_list", []).append((int(r), int(c)))
    if "mesh_list" in opts:
        opts["meshes"] = opts.pop("mesh_list")
    return m, reps, opts


def main(argv=None):
    import pathlib

    import jax
    import jax.numpy as jnp

    # persistent compilation cache (first compile through the device tunnel
    # takes minutes; see CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.parallel import sharded
    from clipper_tpu.types import Params

    m, reps, opts = _parse_args(argv if argv is not None else sys.argv[1:])
    storage = {"int8": jnp.int8, "bf16": jnp.bfloat16,
               "none": None}[opts["storage"]]

    ndev = len(jax.devices())
    shapes = opts["meshes"]
    if shapes is None:
        shapes = []
        r = 1
        while r * r <= ndev:
            if ndev % r == 0:
                shapes.append((r, ndev // r))
                if r != ndev // r:
                    shapes.append((ndev // r, r))
            r += 1
        shapes.sort(key=lambda s: (s[0] * s[1], s[0]))

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, Agt = harness.make_problem(pcd0, m, opts["rho"], rng)
    pcd1 = pcd1.astype(np.float32)
    u0 = np.asarray(
        utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32))
    inv = harness.default_invariant()

    A = jnp.asarray(A, jnp.int32)
    P1 = jnp.asarray(pcd0)[A[:, 0]]
    P2 = jnp.asarray(pcd1)[A[:, 1]]
    u0 = jnp.asarray(u0, jnp.float32)

    itemsize = (jnp.dtype(storage).itemsize if storage is not None else 4)
    results = {}
    for shape in shapes:
        R, C = shape
        if R * C > ndev:
            print(f"mesh {shape}: skipped (only {ndev} devices)")
            continue
        mesh = sharded.make_mesh(shape)
        m_pad = sharded._padded_size(m, R, C)
        P1p, P2p, u0p = sharded.pad_problem(P1, P2, u0, m_pad)
        A_pad = jnp.pad(A, ((0, m_pad - m), (0, 0)), constant_values=-1)

        pipeline = sharded.build_sharded_pipeline(
            inv, mesh, Params(), solver="flat", storage_dtype=storage,
            probes=opts["probes"], power_steps=opts["power"],
            build_chunk=opts["build_chunk"],
            matvec_chunk=opts["matvec_chunk"])

        blk_bytes = 2 * m_pad * m_pad // (R * C) * itemsize
        print(f"mesh {shape}: m_pad={m_pad}, per-device [M;C] block = "
              f"{blk_bytes / 1e9:.2f} GB ({opts['storage']})", flush=True)

        # compile + warmup
        u, F, ifinal, mask = pipeline(P1p, P2p, A_pad, u0p, m)
        np.asarray(F)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            u, F, ifinal, mask = pipeline(P1p, P2p, A_pad, u0p, m)
            np.asarray(F)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        mask_np = np.asarray(mask)[:m]
        p, rcl = bdata.get_precision_recall(np.asarray(A)[mask_np], Agt)
        results[shape] = dt
        print(f"mesh {shape}: {dt * 1e3:9.1f} ms/solve  F={float(F):.2f}  "
              f"P={p * 100:.1f}% R={rcl * 100:.1f}%", flush=True)

    if len(results) > 1:
        shapes_done = list(results)
        base_shape = shapes_done[0]
        base_t = results[base_shape]
        base_n = base_shape[0] * base_shape[1]
        print("\nstrong scaling (fixed m, growing mesh):")
        for shape, dt in results.items():
            n = shape[0] * shape[1]
            eff = (base_t / dt) * (base_n / n)
            print(f"  mesh {shape}: speedup {base_t / dt:5.2f}x  "
                  f"efficiency {eff:.2f}")
    return results


if __name__ == "__main__":
    main()
