"""Device mesh construction.

The reference is single-device (SURVEY.md §2.4: no tf.distribute anywhere);
scaling here is JAX-native: a 1-D ``data`` mesh over all chips, gradients
reduced with XLA collectives over ICI. No custom comm backend exists or is
needed (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


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
