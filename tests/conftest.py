"""Test configuration: CPU backend with a virtual 8-device mesh, fp64 on.

Multi-device sharding is validated on a simulated host-platform mesh
(no TPUs required); fp64 gives bit-level parity against the reference's
double-precision semantics.

Note: the environment's axon TPU plugin force-sets jax_platforms, so the env
var alone is not enough — we override via jax.config before any backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
