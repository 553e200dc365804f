"""Symmetric-triangle storage bench: capacity + one-read Pallas matvec.

Compares, on one chip at large m:
  * dense stacked [M; C] int8 matvec (the round-2 configuration),
  * XLA triangle-tile matvec (2x capacity, same bytes/tick),
  * Pallas one-read triangle matvec (2x capacity AND ~half bytes/tick),
and runs the end-to-end capacity point past the dense ceiling.

Usage:
  python -m clipper_tpu.bench.symstore_bench [m] [--probes=K] [--rho=0.95]
      [--skip-dense] [--mv-only] [--tiles-block=8]
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
    m = int(pos[0]) if pos else 16384
    probes = 1
    rho = 0.95
    skip_dense = "--skip-dense" in argv
    mv_only = "--mv-only" in argv
    rows_only = "--rows-only" in argv   # chunked storage only: the capacity
                                        # point cannot hold both layouts
    tiles_block = 8
    for a in argv:
        if a.startswith("--probes="):
            probes = int(a.split("=", 1)[1])
        elif a.startswith("--rho="):
            rho = float(a.split("=", 1)[1])
        elif a.startswith("--tiles-block="):
            tiles_block = int(a.split("=", 1)[1])

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.ops import symstore
    from clipper_tpu.solvers import msrc, msrc_flat
    from clipper_tpu.types import Params, Rounding

    t = 128
    m_pad = -(-m // t) * t
    nt = m_pad // t
    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
    inv = harness.default_invariant()

    Aj = jnp.asarray(A, jnp.int32)
    P1 = jnp.asarray(pcd0)[Aj[:, 0]]
    P2 = jnp.asarray(pcd1.astype(np.float32))[Aj[:, 1]]
    u0 = jnp.asarray(np.asarray(
        utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32)))
    pad = m_pad - m
    if pad:
        P1 = jnp.pad(P1, ((0, pad), (0, 0)))
        P2 = jnp.pad(P2, ((0, pad), (0, 0)))
        Aj = jnp.pad(Aj, ((0, pad), (0, 0)), constant_values=-1)

    T = nt * (nt + 1) // 2
    print(f"m={m} (pad {m_pad}, nt={nt}, T={T}); triangle int8 = "
          f"{T * 2 * t * t / 1e9:.2f} GB; dense stacked would be "
          f"{2 * m_pad * m_pad / 1e9:.2f} GB", flush=True)

    tiles = None
    if not rows_only:
        build = jax.jit(lambda P1, P2, A: symstore.build_symtiles(
            inv, P1, P2, A, m, tile=t, storage_dtype=jnp.int8))
        t0 = time.perf_counter()
        tiles = build(P1, P2, Aj)
        tiles.block_until_ready()
        np.asarray(tiles[0, 0, :1])
        print(f"tile build: {time.perf_counter() - t0:.2f} s (incl. compile)",
              flush=True)

    G = min(32, nt)
    chunk_r, chunk_c0, _, _ = symstore.row_chunk_coords(nt, G)
    buildc = jax.jit(lambda P1, P2, A: symstore.build_symchunks(
        inv, P1, P2, A, m, tile=t, G=G, storage_dtype=jnp.int8))
    t0 = time.perf_counter()
    chunks = buildc(P1, P2, Aj)
    np.asarray(chunks[0, 0, :1])
    print(f"chunk build (G={G}, {chunks.nbytes/1e9:.2f} GB incl. slack): "
          f"{time.perf_counter() - t0:.2f} s (incl. compile)", flush=True)

    # --- matvec microbench (tiles passed as a jit ARGUMENT — the axon
    # remote compiler rejects big closure constants, CLAUDE.md) ---
    def bench_mv(name, make_mv, K):
        u = (jnp.tile(u0[:, None], (1, K)) if K > 1 else u0)
        u = jnp.pad(u, ((0, pad),) + (((0, 0),) if K > 1 else ()))
        f = jax.jit(lambda tiles, u: make_mv(tiles)(u))
        Mu, Cu = f(tiles, u)
        np.asarray(Mu[:1])
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            Mu, Cu = f(tiles, u)
        np.asarray(Mu[:1])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} K={K}: {dt * 1e3:8.2f} ms/tick", flush=True)
        return dt

    if not rows_only:
        for K in ([1, probes] if probes > 1 else [1]):
            bench_mv("sym XLA (2-read)",
                     lambda tl: symstore.make_sym_dual_matvec(tl, nt,
                                                              jnp.float32),
                     K)
            bench_mv("sym Pallas (1-read)",
                     lambda tl: symstore.make_sym_dual_matvec_pallas(
                         tl, nt, jnp.float32, tiles_block=tiles_block), K)

    def bench_rows(K):
        u = (jnp.tile(u0[:, None], (1, K)) if K > 1 else u0)
        u = jnp.pad(u, ((0, pad),) + (((0, 0),) if K > 1 else ()))
        f = jax.jit(lambda ch, u: symstore.make_sym_dual_matvec_pallas_rows(
            ch, chunk_r, chunk_c0, nt, jnp.float32)(u))
        Mu, Cu = f(chunks, u)
        np.asarray(Mu[:1])
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            Mu, Cu = f(chunks, u)
        np.asarray(Mu[:1])
        dt = (time.perf_counter() - t0) / reps
        print(f"{'sym Pallas rows (1-read)':28s} K={K}: "
              f"{dt * 1e3:8.2f} ms/tick", flush=True)

    for K in ([1, probes] if probes > 1 else [1]):
        bench_rows(K)

    if not skip_dense and 2 * m_pad * m_pad < 12e9:
        from clipper_tpu.ops.affinity import score_consistency_stored
        D1j = jnp.asarray(pcd0)
        D2j = jnp.asarray(pcd1.astype(np.float32))
        MC = jax.jit(lambda: score_consistency_stored(
            inv, D1j, D2j, Aj[:m], affinityeps=1e-4,
            storage_dtype=jnp.int8))()
        for K in ([1, probes] if probes > 1 else [1]):
            u = (jnp.tile(u0[:, None], (1, K)) if K > 1 else u0)
            f = jax.jit(lambda MC, u: msrc_flat.make_stacked_matvec(
                MC, jnp.float32)(u))
            Mu, Cu = f(MC, u)
            np.asarray(Mu[:1])
            t0 = time.perf_counter()
            for _ in range(10):
                Mu, Cu = f(MC, u)
            np.asarray(Mu[:1])
            print(f"{'dense stacked int8':28s} K={K}: "
                  f"{(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms/tick",
                  flush=True)
        del MC

    if mv_only:
        return

    del tiles

    # --- end-to-end solve over the row-chunked Pallas storage ---
    @jax.jit
    def solve(chunks, u0p):
        mv = symstore.make_sym_dual_matvec_pallas_rows(
            chunks, chunk_r, chunk_c0, nt, jnp.float32)
        u0i = msrc_flat.power_init(mv, u0p, 4)
        if probes > 1:
            u, F, i = msrc_flat.flat_solve_single_multiprobe(
                mv, u0i, Params(), probes=probes)
        else:
            u, F, i = msrc_flat.flat_solve_single(mv, u0i, Params())
        from clipper_tpu.parallel.pool import support_objective
        nnz = jnp.sum(u > 0)
        F = jax.lax.cond(
            nnz > 1024,
            lambda: symstore.exact_objective(inv, P1, P2, Aj, u, m, tile=t,
                                             affinityeps=1e-4),
            lambda: support_objective(inv, P1, P2, Aj, u, affinityeps=1e-4,
                                      k=1024))
        return u, F, i

    u0p = jnp.pad(u0, (0, pad))
    u, F, i = solve(chunks, u0p)
    np.asarray(F)
    # free the warmup storage BEFORE the timed rebuild: two live triangle
    # arrays at m = 114,688 are 26 GB — over a 16 GB v5e's HBM
    del chunks
    del u, F, i
    t0 = time.perf_counter()
    chunks2 = buildc(P1, P2, Aj)
    u, F, i = solve(chunks2, u0p)
    Fh = float(np.asarray(F))
    dt = time.perf_counter() - t0
    mask = np.asarray(msrc.round_solution(u[:m], F, Rounding.DSD_HEU))
    p, r = bdata.get_precision_recall(A[mask], Agt)
    print(f"end-to-end (build+solve+polish): {dt:.3f} s  F={Fh:.1f}  "
          f"P={p * 100:.1f}% R={r * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
