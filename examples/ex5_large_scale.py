"""Example 5: large-scale association — capacity engines beyond the reference.

The reference's ceiling is one node's memory for the dense m x m double
affinity matrix (reference: src/clipper.cpp:29 allocates it before
sparsification; the published operating point is m = 1000). This example
runs the same bunny registration protocol at m = 16,384 putative
associations through the two TPU-native capacity engines:

  1. `symstore.solve_single` — symmetric-triangle int8 tile storage + the
     one-read row-chunked Pallas dual matvec (auto on TPU; XLA tile
     matvec elsewhere). One 16 GB chip holds m = 114,688 this way.
  2. `symstore.solve_sharded_sym` — the same triangle tile list split
     evenly over a device mesh (m^2 total bytes across D devices), one
     psum per solver tick. Runs here on whatever devices are available
     (a CPU run can simulate a mesh with
     XLA_FLAGS=--xla_force_host_platform_device_count=8).

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
from clipper_tpu.ops import symstore
from clipper_tpu.solvers import msrc


def main(m=16384, rho=0.95):
    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny().astype(np.float32)
    pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
    inv = harness.default_invariant()
    u0 = np.asarray(ct.utils.randvec(jax.random.PRNGKey(0), m,
                                     dtype=jnp.float32))

    tri_gb = (m * m + m * 128) / 1e9
    print(f"m={m} @ {rho:.0%} outliers: triangle int8 storage ~{tri_gb:.2f} "
          f"GB (dense f64, as the reference allocates: {8 * m * m / 1e9:.1f}"
          f" GB)")

    # --- single-device triangle solve ---
    t0 = time.perf_counter()
    u, F, it = symstore.solve_single(inv, pcd0, pcd1.astype(np.float32), A,
                                     u0, ct.Params(), probes=8,
                                     power_steps=4)
    mask = np.asarray(msrc.round_solution(u, F.astype(u.dtype),
                                          ct.Rounding.DSD_HEU))
    dt = time.perf_counter() - t0
    p, r = bdata.get_precision_recall(A[mask], Agt)
    print(f"single-device triangle solve: {dt:.2f} s (incl. compile)  "
          f"inliers={int(mask.sum())}  precision {p:.1%}  recall {r:.1%}")

    # --- mesh-sharded triangle solve (all available devices) ---
    if len(jax.devices()) > 1:
        t0 = time.perf_counter()
        soln = symstore.solve_sharded_sym(inv, pcd0,
                                          pcd1.astype(np.float32), A, u0,
                                          ct.Params(), power_steps=4)
        mask2 = np.asarray(soln.mask)
        dt = time.perf_counter() - t0
        p2, r2 = bdata.get_precision_recall(A[mask2], Agt)
        print(f"{len(jax.devices())}-device sharded triangle solve: "
              f"{dt:.2f} s (incl. compile)  inliers={int(mask2.sum())}  "
              f"precision {p2:.1%}  recall {r2:.1%}")
    return p, r


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
