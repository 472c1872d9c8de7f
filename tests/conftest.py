"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (the standard JAX pattern — SURVEY.md §4)."""
import os

# The session environment pins JAX_PLATFORMS=axon (one real TPU chip);
# tests must run hermetically on a virtual 8-device CPU mesh, so override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
