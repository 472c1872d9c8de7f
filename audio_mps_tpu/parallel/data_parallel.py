"""Data-parallel training over an ICI mesh.

The natural scaling strategy for cMPS training (SURVEY.md §2.4): the model
state is tiny (a few D x D matrices) while the work per example is a 2^16-
step scan, so replicate parameters, shard the batch over the ``data`` mesh
axis, and reduce gradients with an explicit ``psum_scatter``-free ``pmean``
over ICI inside ``shard_map``. This is the TPU-native equivalent of the
BASELINE "D=128 data-parallel training across chips" config
(BASELINE.json configs[4]); the reference itself has no distribution at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .compat import shard_map

from ..config import CMPSConfig
from ..models import core
from ..training import (_on_tpu, make_latent_loss_fn, make_loss_fn,
                        make_optimizer)
from .mesh import DATA_AXIS


def make_dp_train_step(mps_model: str, cfg: CMPSConfig, mesh: Mesh,
                       optimizer=None, axis: str = DATA_AXIS,
                       fused: Optional[bool] = None):
    """Build (optimizer, jitted_sharded_step).

    step(params, opt_state, batch[B_global, T]) -> (params, opt_state,
    metrics); params/opt_state replicated, batch sharded over `axis`.
    For ``mps_model="latent"`` the step takes an extra PRNG key —
    step(params, opt_state, batch, key) — matching the single-device
    latent step (training.make_train_step).
    Per-device grads are averaged with `jax.lax.pmean` (an XLA all-reduce
    riding ICI); the optimizer update runs redundantly-replicated, which is
    optimal at this parameter scale (a few KB).

    `fused=None` (default) auto-selects the fused Pallas custom-VJP kernels
    on TPU — multi-chip training inherits the single-chip fused speedup —
    and the XLA scan elsewhere; pass an explicit bool to force (fused=True
    off-TPU runs the kernels in interpret mode, pinned == single-device
    fused by tests/test_parallel.py).
    """
    optimizer = optimizer or make_optimizer(cfg)
    if mps_model == "latent":
        return optimizer, _make_dp_latent_step(cfg, mesh, optimizer, axis,
                                               fused)
    loss_fn = make_loss_fn(mps_model, cfg, fused=fused)

    def local_step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis, None)),
        out_specs=(P(), P(), P()),
        check=False)

    step = jax.jit(sharded, donate_argnums=(0, 1))
    return optimizer, step


def _make_dp_latent_step(cfg: CMPSConfig, mesh: Mesh, optimizer, axis: str,
                         fused: Optional[bool]):
    """Data-parallel ELBO step for the latent-conditioned family
    (models/latent.py — the working completion of the reference's
    follow_vae.py WIP). The reparameterization noise is drawn ONCE at the
    global batch shape from the replicated key and each device slices its
    shard's rows, so the sharded step is bit-identical to the
    single-device latent step with the same key (pinned by
    tests/test_parallel.py)."""
    loss_fn = make_latent_loss_fn(cfg, fused=fused)
    n_dev = mesh.devices.size

    def local_step(params, opt_state, batch, key):
        b_local = batch.shape[0]
        eps_global = jax.random.normal(key, (b_local * n_dev,
                                             cfg.latent_dim))
        idx = jax.lax.axis_index(axis)
        eps = jax.lax.dynamic_slice_in_dim(eps_global, idx * b_local,
                                           b_local, 0)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, eps=eps)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P()),
        out_specs=(P(), P(), P()),
        check=False)

    return jax.jit(sharded, donate_argnums=(0, 1))


def make_dp_sample(mps_model: str, cfg: CMPSConfig, mesh: Mesh,
                   axis: str = DATA_AXIS, fused: Optional[bool] = None):
    """Sharded ancestral sampling: samples split across chips (generation is
    irreducibly serial in time — throughput comes from batching across the
    mesh, SURVEY.md §7 hard parts). Supports all three families (latent
    samples from the prior via its decoded per-example psi_0).

    `fused=None` auto-selects the fused Pallas SDE sampler kernels inside
    each shard on TPU (interpret mode elsewhere when forced True) — the
    same dispatch `sample.py --fused` uses, riding shard_map like the DP
    training step."""
    if fused is None:
        fused = _on_tpu()
    if mps_model == "latent":
        from ..models.latent import sample_latent
        if fused:
            import functools
            fn = functools.partial(sample_latent, fused=True)
        else:
            fn = sample_latent
    elif fused:
        from ..ops.pallas_scan import (psi_sample_pallas_keyed,
                                       rho_sample_pallas_keyed)
        fn = (rho_sample_pallas_keyed if mps_model == "rho_mps"
              else psi_sample_pallas_keyed)
    else:
        fn = core.sample_rho if mps_model == "rho_mps" else core.sample_psi

    def build(num_samples: int, length: int, temp: float = 1.0):
        n_dev = mesh.devices.size
        if num_samples % n_dev:
            raise ValueError(f"num_samples={num_samples} must divide over "
                             f"{n_dev} devices")
        local_n = num_samples // n_dev

        def local(params, key):
            idx = jax.lax.axis_index(axis)
            key = jax.random.fold_in(key, idx)
            return fn(params, cfg, key, local_n, length, temp)

        sharded = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                            out_specs=P(axis, None), check=False)
        return jax.jit(sharded)

    return build


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a [B, ...] batch sharded over the mesh's data axis."""
    s = NamedSharding(mesh, P(axis, *(None,) * (batch.ndim - 1)))
    return jax.device_put(batch, s)
