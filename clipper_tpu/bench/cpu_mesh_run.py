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
    # the env vars take effect at XLA backend creation, not jax import
    # (running as `python -m` necessarily imports the package, and with it
    # jax, before main()) — so the real precondition is that no backend has
    # been initialized yet; with one live, the virtual-device count and
    # collective timeouts would silently not apply
    if "jax" in sys.modules:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            raise RuntimeError(
                "cpu_mesh_run must set XLA_FLAGS before any XLA backend is "
                "initialized — run it as a fresh process "
                "(python -m clipper_tpu.bench.cpu_mesh_run ...) without "
                "touching jax.devices()/jit first")
    argv = list(argv if argv is not None else sys.argv[1:])
    ndev = 8
    bench = "sharded"
    for a in list(argv):
        if a.startswith("--devices="):
            ndev = int(a.split("=", 1)[1])
            argv.remove(a)
        elif a.startswith("--bench="):
            bench = a.split("=", 1)[1]
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

    if bench == "symshard":
        from clipper_tpu.bench import symshard_bench

        return symshard_bench.main(argv)
    from clipper_tpu.bench import sharded_bench

    return sharded_bench.main(argv)


if __name__ == "__main__":
    main()
