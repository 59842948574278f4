"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware (the standard JAX trick).  Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Plugins (e.g. jaxtyping) may import jax before this conftest runs, in which
# case JAX_PLATFORMS was already read; update the live config too.  The
# backend itself initializes lazily, so this is still early enough.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

