"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (the standard JAX pattern — SURVEY.md §4).

Note: the session's sitecustomize registers the axon TPU backend and imports
jax before pytest starts, so plain env vars are too late — use
jax.config.update, and set XLA_FLAGS before the CPU backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU-compile-bound (it asserts physics parity on tiny
# fixtures, not CPU speed): dialing back backend optimization cuts suite
# wall-clock ~35% with identical test outcomes.
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
