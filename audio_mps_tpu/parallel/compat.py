"""shard_map import/signature compatibility across jax versions.

jax >= 0.8 moved shard_map out of jax.experimental (which now warns) and
renamed its replication-check kwarg ``check_rep`` -> ``check_vma``. All
parallel modules route through this wrapper.
"""
from __future__ import annotations

import inspect

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

_CHECK_KW = ("check_vma"
             if "check_vma" in inspect.signature(_shard_map).parameters
             else "check_rep")


def shard_map(f, *, mesh, in_specs, out_specs, check: bool = False):
    """`jax.shard_map` with the replication check disabled by default (the
    cMPS shard_maps use collectives whose replication the checker cannot
    infer)."""
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **{_CHECK_KW: check})
