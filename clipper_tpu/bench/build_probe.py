"""Fused-build kernel anatomy probe: where do the 18.3 ms go?

Round-3 roofline put the Pallas [M; C] build at the headline point
(B=512, m=1024, int8) at 18.3 ms against a 2.1 ms pure-int8-write floor,
"VPU-bound at ~30 vector ops/element". This probe times ablated kernel
variants to attribute the gap between arithmetic classes:

  full        : the production kernel's math (2 sqrt + exp + masks)
  sqrt1       : c^2 = q1 + q2 - 2 sqrt(q1 q2)  (ONE sqrt, no abs)
  noexp       : gate only, write quantized c^2  (wrong values; timing)
  nosqrt      : gate on squared distances only (no sqrt, no exp)
  writeonly   : constant tile write (the floor)

Usage: python -m clipper_tpu.bench.build_probe [B] [m]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None):
    import pathlib

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    argv = argv if argv is not None else sys.argv[1:]
    B = int(argv[0]) if argv else 512
    m = int(argv[1]) if len(argv) > 1 else 1024
    tile = min(1024, m)
    d = 3
    sigma, eps_inv, affeps = 0.015, 0.05, 1e-4
    _INT8 = 127.0

    rng = np.random.default_rng(0)
    P1 = jnp.asarray(rng.uniform(size=(B, m, d)), jnp.float32)
    P2 = jnp.asarray(rng.uniform(size=(B, m, d)), jnp.float32)
    A = jnp.asarray(rng.integers(0, 10000, size=(B, m, 2)), jnp.int32)

    nT = m // tile

    def make_builder(variant):
        def kernel(P1r_ref, P1ct_ref, P2r_ref, P2ct_ref, Ar_ref, Act_ref,
                   out_ref, c_scr):
            i = pl.program_id(0)
            j = pl.program_id(1)
            s = pl.program_id(2)

            @pl.when(s == 0)
            def _m():
                if variant == "writeonly":
                    out_ref[...] = jnp.zeros_like(out_ref)
                    c_scr[...] = jnp.zeros_like(c_scr)
                    return
                P1r = P1r_ref[...]
                P1ct = P1ct_ref[...]
                P2r = P2r_ref[...]
                P2ct = P2ct_ref[...]
                q1 = jnp.zeros((tile, tile), jnp.float32)
                q2 = jnp.zeros((tile, tile), jnp.float32)
                for k in range(d):
                    d1 = (jax.lax.slice_in_dim(P1r, k, k + 1, axis=1)
                          - jax.lax.slice_in_dim(P1ct, k, k + 1, axis=0))
                    d2 = (jax.lax.slice_in_dim(P2r, k, k + 1, axis=1)
                          - jax.lax.slice_in_dim(P2ct, k, k + 1, axis=0))
                    q1 = q1 + d1 * d1
                    q2 = q2 + d2 * d2
                if variant == "full":
                    l1 = jnp.sqrt(q1)
                    l2 = jnp.sqrt(q2)
                    c = jnp.abs(l1 - l2)
                    ok = c < eps_inv
                    scr = jnp.where(
                        ok, jnp.exp(-0.5 * c * c / (sigma * sigma)), 0.0)
                elif variant == "sqrt1":
                    csq = jnp.maximum(q1 + q2
                                      - 2.0 * jnp.sqrt(q1 * q2), 0.0)
                    ok = csq < eps_inv * eps_inv
                    scr = jnp.where(
                        ok, jnp.exp(csq * (-0.5 / (sigma * sigma))), 0.0)
                elif variant == "noexp":
                    csq = jnp.maximum(q1 + q2
                                      - 2.0 * jnp.sqrt(q1 * q2), 0.0)
                    ok = csq < eps_inv * eps_inv
                    scr = jnp.where(ok, csq, 0.0)
                else:  # nosqrt: gate on |q1 - q2| only (wrong values)
                    dq = q1 - q2
                    ok = dq * dq < eps_inv * eps_inv
                    scr = jnp.where(ok, dq, 0.0)
                Ar = Ar_ref[...]
                Act = Act_ref[...]
                distinct = ~(
                    (jax.lax.slice_in_dim(Ar, 0, 1, axis=1)
                     == jax.lax.slice_in_dim(Act, 0, 1, axis=0))
                    | (jax.lax.slice_in_dim(Ar, 1, 2, axis=1)
                       == jax.lax.slice_in_dim(Act, 1, 2, axis=0)))
                gr = i * tile + jax.lax.broadcasted_iota(
                    jnp.int32, (tile, tile), 0)
                gc = j * tile + jax.lax.broadcasted_iota(
                    jnp.int32, (tile, tile), 1)
                keep = (distinct & (gr != gc) & (gr < m) & (gc < m)
                        & (scr > affeps))
                Mq = jnp.clip(jnp.round(jnp.where(keep, scr, 0.0) * _INT8),
                              0, 127)
                Cq = jnp.where(keep, _INT8, 0.0)
                out_ref[...] = Mq.astype(jnp.int8)
                c_scr[...] = Cq.astype(jnp.int8)

            @pl.when(s == 1)
            def _c():
                out_ref[...] = c_scr[...]

        row = pl.BlockSpec((tile, d), lambda i, j, s: (i, 0),
                           memory_space=pltpu.VMEM)
        colt = pl.BlockSpec((d, tile), lambda i, j, s: (0, j),
                            memory_space=pltpu.VMEM)
        arow = pl.BlockSpec((tile, 2), lambda i, j, s: (i, 0),
                            memory_space=pltpu.VMEM)
        acolt = pl.BlockSpec((2, tile), lambda i, j, s: (0, j),
                             memory_space=pltpu.VMEM)
        outs = pl.BlockSpec((tile, tile), lambda i, j, s: (s * nT + i, j),
                            memory_space=pltpu.VMEM)

        def one(P1b, P2b, Ab):
            return pl.pallas_call(
                kernel,
                grid=(nT, nT, 2),
                in_specs=[row, colt, row, colt, arow, acolt],
                out_specs=outs,
                out_shape=jax.ShapeDtypeStruct((2 * m, m), jnp.int8),
                scratch_shapes=[pltpu.VMEM((tile, tile), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(P1b, P1b.T, P2b, P2b.T, Ab, Ab.T)

        return jax.jit(jax.vmap(one))

    print(f"B={B} m={m} tile={tile} int8 out = {2*B*m*m/1e9:.2f} GB")
    results = {}
    for variant in ("writeonly", "nosqrt", "noexp", "sqrt1", "full"):
        f = make_builder(variant)
        out = f(P1, P2, A)
        np.asarray(out[0, 0, :1])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(P1, P2, A)
        np.asarray(out[0, 0, :1])
        dt = (time.perf_counter() - t0) / reps
        results[variant] = dt
        print(f"{variant:10s}: {dt * 1e3:8.2f} ms", flush=True)
    return results


if __name__ == "__main__":
    main()
