"""Run the sharded-engine benchmark on a virtual N-device CPU mesh.

The driver for BASELINE's distributed n >= 100k evidence when no multi-chip
TPU hardware is attached: forces the CPU platform (the axon plugin force-sets
``jax_platforms``, so the env var alone is not enough — see CLAUDE.md) with
``--xla_force_host_platform_device_count`` virtual devices, then delegates to
``clipper_tpu.bench.sharded_bench`` unchanged.

All virtual devices share this host's physical cores, so wall-clock speedup
across device counts saturates at the core count; the meaningful measurements
here are (a) correctness at scale (P/R at m >= 131k on a real 8-device mesh
program with real collectives) and (b) sharding overhead = t(mesh)/t(1x1) at
fixed m on fixed silicon — the collective/padding/layout cost the mesh adds
over the single-device program, which is the part of scaling efficiency that
is measurable without N physical chips.

Usage:
  python -m clipper_tpu.bench.cpu_mesh_run [--devices=8] <sharded_bench args>
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    if "jax" in sys.modules:
        raise RuntimeError(
            "cpu_mesh_run must set XLA_FLAGS/JAX_PLATFORMS before jax is "
            "imported — run it as a fresh process "
            "(python -m clipper_tpu.bench.cpu_mesh_run ...); with jax "
            "already imported the virtual-device count and collective "
            "timeouts would silently not apply")
    argv = list(argv if argv is not None else sys.argv[1:])
    ndev = 8
    for a in list(argv):
        if a.startswith("--devices="):
            ndev = int(a.split("=", 1)[1])
            argv.remove(a)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
        # N virtual devices share this host's physical cores, so a
        # device's turn at a collective can lag far behind the others';
        # XLA CPU's default 40 s in-process rendezvous timeout kills
        # m >= 100k runs (one tick's local matmul is seconds per device)
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from clipper_tpu.bench import sharded_bench

    return sharded_bench.main(argv)


if __name__ == "__main__":
    main()
