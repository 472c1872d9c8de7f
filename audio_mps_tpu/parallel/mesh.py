"""Device mesh construction.

The reference is single-device (SURVEY.md §2.4: no tf.distribute anywhere);
scaling here is JAX-native: a 1-D ``data`` mesh over all chips, gradients
reduced with XLA collectives over ICI. No custom comm backend exists or is
needed (SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"

# XLA flag that splits the host platform into virtual devices — the standard
# JAX pattern for testing multi-chip sharding without hardware (SURVEY.md §4).
_HOST_COUNT_FLAG = "xla_force_host_platform_device_count"


def _backends_initialized() -> bool:
    try:
        from jax._src import xla_bridge as xb
        return bool(xb.backends_are_initialized())
    except Exception:  # pragma: no cover - private API moved: assume yes
        return True


def ensure_devices(n_devices: int) -> bool:
    """Best-effort: make ``len(jax.devices()) >= n_devices``.

    If no JAX backend has been initialized yet in this process, apply the
    virtual-CPU-mesh recipe (``--xla_force_host_platform_device_count=N`` +
    ``jax_platforms=cpu`` — the tests/conftest.py pattern): the dryrun's
    contract is to validate multi-chip sharding on virtual devices, so CPU
    is preferred over peeking for real chips (peeking would initialize the
    backend and make the switch impossible). If a backend is already up,
    existing devices are used when sufficient. Returns True if the device
    count is now >= n_devices; callers that get False must re-exec in a
    fresh process with ``JAX_PLATFORMS=cpu`` and the XLA flag set.
    """
    prior_flags = os.environ.get("XLA_FLAGS", "")
    if _HOST_COUNT_FLAG not in prior_flags:
        os.environ["XLA_FLAGS"] = (
            prior_flags + f" --{_HOST_COUNT_FLAG}={n_devices}").strip()
    if not _backends_initialized():
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        ok = len(jax.devices()) >= n_devices
    except RuntimeError:
        ok = False
    if not ok and _HOST_COUNT_FLAG not in prior_flags:
        # provisioning failed (backend was already up): undo the env
        # mutation so unrelated child processes don't inherit a virtual
        # device count they never asked for
        os.environ["XLA_FLAGS"] = prior_flags
    return ok


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over `n_devices` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
