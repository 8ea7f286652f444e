"""Test harness config: run on a virtual 8-device CPU mesh, in float64.

Must set env vars before jax is imported anywhere.
"""

import os

# The environment may force JAX_PLATFORMS=axon (TPU); override for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone loses to plugins
jax.config.update("jax_enable_x64", True)
