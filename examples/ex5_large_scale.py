"""Example 5: large-scale association — capacity engines beyond the reference.

The reference's ceiling is one node's memory for the dense m x m double
affinity matrix (reference: src/clipper.cpp:29 allocates it before
sparsification; the published operating point is m = 1000). This example
runs the same bunny registration protocol at m = 16,384 putative
associations through the SAME facade class a clipperpy user would call
(reference: include/clipper/clipper.h:78-183) — only the engine changes:

  1. `Clipper(engine='triangle')` (the 'auto' default from m >= 8192)
     routes solve() through symmetric-triangle int8 tile storage + the
     one-read row-chunked Pallas dual matvec (ops/symstore.solve_single).
     No dense (m, m) is ever materialized; one 16 GB chip holds
     m = 114,688 this way.
  2. `Clipper(engine='sharded')` splits the same triangle tile list
     evenly over a device mesh (m^2 total bytes across D devices), one
     psum per solver tick (ops/symstore.solve_sharded_sym). A CPU run can
     simulate a mesh with XLA_FLAGS=--xla_force_host_platform_device_count=8.

Both polish the objective in full precision before the omega = round(F)
rounding, so P/R matches the dense f32 pipeline.

Run: python examples/ex5_large_scale.py [m]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import clipper_tpu as ct
from clipper_tpu.bench import data as bdata
from clipper_tpu.bench import harness


def main(m=16384, rho=0.95):
    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
    pcd1 = pcd1.astype(np.float32)
    inv = harness.default_invariant()

    tri_gb = (m * m + m * 128) / 1e9
    print(f"m={m} @ {rho:.0%} outliers: triangle int8 storage ~{tri_gb:.2f} "
          f"GB (dense f64, as the reference allocates: {8 * m * m / 1e9:.1f}"
          f" GB)")

    # --- single-device triangle engine, standard facade flow ---
    # (engine='auto' picks 'triangle' from m >= 8192; named explicitly
    # here for the example's sake)
    c = ct.Clipper(inv, ct.Params(), dtype=jnp.float32, engine="triangle",
                   engine_opts=dict(probes=8, power_steps=4))
    t0 = time.perf_counter()
    c.score_pairwise_consistency(pcd0.T, pcd1.T, A)   # (d, n) columns, as
    c.solve()                                         # in clipperpy
    sel = c.get_selected_associations()
    dt = time.perf_counter() - t0
    p, r = bdata.get_precision_recall(sel, Agt)
    print(f"facade triangle engine: {dt:.2f} s (incl. compile)  "
          f"inliers={len(sel)}  precision {p:.1%}  recall {r:.1%}")

    # --- mesh-sharded triangle engine (all available devices) ---
    if len(jax.devices()) > 1:
        cs = ct.Clipper(inv, ct.Params(), dtype=jnp.float32,
                        engine="sharded",
                        engine_opts=dict(power_steps=4))
        t0 = time.perf_counter()
        cs.score_pairwise_consistency(pcd0.T, pcd1.T, A)
        cs.solve()
        sel2 = cs.get_selected_associations()
        dt = time.perf_counter() - t0
        p2, r2 = bdata.get_precision_recall(sel2, Agt)
        print(f"{len(jax.devices())}-device sharded facade engine: "
              f"{dt:.2f} s (incl. compile)  inliers={len(sel2)}  "
              f"precision {p2:.1%}  recall {r2:.1%}")
    return p, r


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
