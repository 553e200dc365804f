"""SDP (MSRC-SDR) at real sizes: scaling table + quality vs the PGA solver.

The reference only smoke-tests its SDP on a 20x20 matrix with no assertions
(reference: test/sdp_test.cpp:59-62) and its SCS backend is host-side; this
benchmark runs the TPU-native ADMM at the benchmark protocol's operating
sizes and records iterations, wall time, the CERTIFIED duality gap, and
P/R against ground truth next to the PGA solver on the same (M, C).

Usage:
  python -m clipper_tpu.bench.sdp_bench [--sizes=256,1024] [--rho=0.9] \
      [--batch=8] [--eps=1e-3] [--time-limit=0] [--zrank=0]

--zrank=r switches the Z-step to the rank-r subspace-iteration projection
(sdp.Params.z_rank) — the large-m route; 0 is the exact full eigh.
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
    sizes = [256, 1024]
    rho, batch, eps, tlim = 0.9, 8, 1e-3, 0.0
    zrank = 0
    aa = 10   # acceleration_interval; 0 disables AA — its (L, 2 n^2)
              # difference history is 10.7 GB at n=8192 (HBM ceiling)
    for a in argv:
        if a.startswith("--sizes="):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--zrank="):
            zrank = int(a.split("=", 1)[1])
        elif a.startswith("--aa="):
            aa = int(a.split("=", 1)[1])
        elif a.startswith("--rho="):
            rho = float(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--eps="):
            eps = float(a.split("=", 1)[1])
        elif a.startswith("--time-limit="):
            tlim = float(a.split("=", 1)[1])

    from clipper_tpu import utils
    from clipper_tpu.bench import data as bdata
    from clipper_tpu.bench import harness
    from clipper_tpu.ops.affinity import build_affinity
    from clipper_tpu.solvers import msrc_flat, sdp
    from clipper_tpu.types import Params

    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    inv = harness.default_invariant()
    sp = sdp.Params(eps_abs=eps, eps_rel=eps, time_limit_secs=tlim,
                    z_rank=zrank, acceleration_interval=aa,
                    acceleration_lookback=min(10, aa))

    print(f"platform={jax.devices()[0].platform}  eps={eps}  rho={rho}")
    for m in sizes:
        pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
        D1 = jnp.asarray(pcd0, jnp.float32)
        D2 = jnp.asarray(pcd1, jnp.float32)
        Aj = jnp.asarray(A, jnp.int32)
        M, C, _ = build_affinity(inv, D1, D2, Aj, affinityeps=1e-4)
        Mi = M + jnp.eye(m, dtype=M.dtype)   # SDP takes identity diagonal
        Ci = C + jnp.eye(m, dtype=C.dtype)

        # --- single SDP solve (compile excluded via a warmup) ---
        sdp.solve(Mi, Ci, sp)
        soln = sdp.solve(Mi, Ci, sp)
        mask = np.zeros(m, bool)
        mask[soln.nodes] = True
        p, r = bdata.get_precision_recall(A[mask], Agt)
        per_it = soln.t_solve / max(1, soln.iters)
        print(f"SDP    m={m:5d}: {soln.t_solve * 1e3:9.1f} ms  "
              f"iters={soln.iters:4d} ({per_it * 1e3:.1f} ms/iter)  "
              f"gap={soln.gap:.2e}  "
              f"P={p * 100:.1f}% R={r * 100:.1f}%", flush=True)

        # --- PGA on the SAME (M, C) ---
        u0 = utils.randvec(jax.random.PRNGKey(0), m, dtype=jnp.float32)

        @jax.jit
        def pga(M, C, u0):
            mv = msrc_flat.stacked_dual_matvec(M, C)
            u0p = msrc_flat.power_init(mv, u0, 4)
            return msrc_flat.flat_solve_single(mv, u0p, Params())

        u, F, _ = pga(M, C, u0)
        np.asarray(F)
        t0 = time.perf_counter()
        u, F, _ = pga(M, C, u0)
        np.asarray(F)
        t_pga = time.perf_counter() - t0
        from clipper_tpu.solvers import msrc
        from clipper_tpu.types import Rounding
        mk = np.asarray(msrc.round_solution(u, F, Rounding.DSD_HEU))
        p2, r2 = bdata.get_precision_recall(A[mk], Agt)
        print(f"PGA    m={m:5d}: {t_pga * 1e3:9.1f} ms  "
              f"P={p2 * 100:.1f}% R={r2 * 100:.1f}%", flush=True)

        # --- batched SDP (vmapped) at the smaller sizes ---
        if m <= 512 and batch > 1:
            probs = [harness.make_problem(pcd0, m, rho, rng)
                     for _ in range(batch)]
            Ms, Cs = [], []
            for pc, Ab, _ in probs:
                Mb, Cb, _ = build_affinity(
                    inv, D1, jnp.asarray(pc, jnp.float32),
                    jnp.asarray(Ab, jnp.int32), affinityeps=1e-4)
                Ms.append(Mb + jnp.eye(m, dtype=Mb.dtype))
                Cs.append(Cb + jnp.eye(m, dtype=Cb.dtype))
            Ms = jnp.stack(Ms)
            Cs = jnp.stack(Cs)
            sdp.solve_batched(Ms, Cs, sp)          # warmup/compile
            t0 = time.perf_counter()
            solns = sdp.solve_batched(Ms, Cs, sp)
            tb = time.perf_counter() - t0
            ps, rs = [], []
            for soln_b, (pc, Ab, Agt_b) in zip(solns, probs):
                mk = np.zeros(m, bool)
                mk[soln_b.nodes] = True
                pb, rb = bdata.get_precision_recall(Ab[mk], Agt_b)
                ps.append(pb)
                rs.append(rb)
            print(f"SDPxB  m={m:5d}: {tb * 1e3:9.1f} ms for B={batch} "
                  f"({tb / batch * 1e3:.1f} ms/prob)  "
                  f"P={np.mean(ps) * 100:.1f}% R={np.mean(rs) * 100:.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
