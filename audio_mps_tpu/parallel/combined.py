"""2D-mesh training: data parallelism x blockwise sequence parallelism.

Composes the two orthogonal scaling strategies (SURVEY.md §2.4 plan; the
reference has no distribution at all) on one ``(data, time)`` mesh:

  - the batch is sharded over the ``data`` axis (parallel/data_parallel.py
    semantics: tiny replicated params, per-example work dominates);
  - each data-parallel row shards the waveform's TIME axis over the
    ``time`` axis — either the FUSED temporal pipeline (carried-state
    partials kernels, parallel/time_pipeline.py; the auto-selected TPU
    path) or the transfer-operator associative scan
    (parallel/time_pscan.py): each device owns a [B/dp, (T-1)/tp] tile.

Communication stays minimal and axis-local: the time-sharding all_gather
and loss psum ride the ``time`` axis only; the gradient pmean rides the
full mesh (both axes). This is the configuration for scaling BOTH batch
throughput AND single-sequence wall-clock at once — e.g. a v5e-8 as a
(2 data x 4 time) mesh trains B=16 at 4x shorter per-sequence critical
path than pure DP.

Exactness: pinned == the single-device fused/XLA step by
tests/test_parallel.py (values and one-Adam-step parameter trajectories).
"""
from __future__ import annotations

import jax
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CMPSConfig
from ..training import make_loss_fn, make_optimizer
from .mesh import DATA_AXIS
from .rank_parallel import MODEL_AXIS
from .time_pipeline import (TIME_AXIS, psi_nll_pipelined_fused,
                            resolve_fused_microbatches,
                            rho_nll_pipelined_fused,
                            rho_nll_rank_pipelined)
from .time_pscan import rho_nll_time_sharded


def make_2d_mesh(n_data: int, n_time: int, devices=None) -> Mesh:
    """A (data, time) mesh over the first n_data*n_time devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_time
    if len(devices) < need:
        raise ValueError(
            f"requested {n_data}x{n_time} mesh, have {len(devices)} devices")
    grid = np.asarray(devices[:need]).reshape(n_data, n_time)
    return Mesh(grid, (DATA_AXIS, TIME_AXIS))


def make_dp_time_train_step(mps_model: str, cfg: CMPSConfig, mesh: Mesh,
                            optimizer=None, time_chunk: int = 1024,
                            fused=None, num_microbatches: int = None):
    """Build (optimizer, jitted step) for combined DP x time-sharded
    training on a (data, time) mesh.

    step(params, opt_state, batch[B, T]) -> (params, opt_state, metrics);
    params/opt_state replicated, batch rows sharded over ``data`` (the NLL
    internally shards time over ``time``). Works for both model families
    (the time-sharded NLL accepts psi's rank-1 factor).

    `fused=None` auto-selects the FUSED temporal pipeline over the
    ``time`` axis (time_pipeline's carried-state partials kernels, with
    the microbatch examples sharded over ``data``) when the block layout
    applies and the per-device chunk kernel fits VMEM; the fallback (and
    `fused=False`) is the XLA transfer-operator associative scan
    (time_pscan). Both are exact vs the single-device step.

    ``mps_model="latent"`` composes the latent family's pipelined ELBO
    with DP: step(params, opt_state, batch, key) — the make_train_step
    latent contract. The fused reconstruction shards each microbatch's
    examples over ``data``; the XLA fallback runs the pipeline
    replicated over ``data`` (exact; there is no latent pscan)."""
    if mps_model not in ("rho_mps", "psi_mps", "latent"):
        raise ValueError(
            f"mps_model must be rho_mps, psi_mps or latent, "
            f"got {mps_model}")
    optimizer = optimizer or make_optimizer(cfg)
    if mps_model == "latent":
        from .time_pipeline import _make_latent_time_step
        return optimizer, _make_latent_time_step(
            cfg, mesh, optimizer, num_microbatches, fused, TIME_AXIS,
            mesh.shape[TIME_AXIS], data_axis=DATA_AXIS)

    def nll(params, cfg_, batch):
        # the time-sharded NLL handles both families via the factor form;
        # catch a params/family mismatch at trace time instead of silently
        # running the other model
        is_rho = hasattr(params, "Wx")
        if is_rho != (mps_model == "rho_mps"):
            raise ValueError(
                f"params are for {'rho_mps' if is_rho else 'psi_mps'} but "
                f"the step was built for {mps_model}")
        B, T = batch.shape
        S = mesh.shape[TIME_AXIS]
        n_data = mesh.shape[DATA_AXIS]
        r_loc = params.Wx.shape[0] if is_rho else 1
        use_fused, M = resolve_fused_microbatches(
            cfg_, fused, num_microbatches, B, r_loc, S, n_data=n_data,
            structural=(T - 1) % S == 0)
        if use_fused:
            pipelined = (rho_nll_pipelined_fused if is_rho
                         else psi_nll_pipelined_fused)
            return pipelined(params, cfg_, batch, mesh,
                             num_microbatches=M, axis=TIME_AXIS,
                             data_axis=DATA_AXIS)
        return rho_nll_time_sharded(params, cfg_, batch, mesh,
                                    time_chunk=time_chunk,
                                    batch_axis=DATA_AXIS)

    loss_fn = make_loss_fn(mps_model, cfg, nll=nll)

    def step_fn(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    return optimizer, step


def make_3d_mesh(n_data: int, n_model: int, n_time: int,
                 devices=None) -> Mesh:
    """A (data, model, time) mesh over the first n_data*n_model*n_time
    devices — the full DP x TP x PP grid. n_data=1 expresses a pure
    TP x PP (rank x time) 2D composition with the same axis names."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model * n_time
    if len(devices) < need:
        raise ValueError(
            f"requested {n_data}x{n_model}x{n_time} mesh, have "
            f"{len(devices)} devices")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model, n_time)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, TIME_AXIS))


def make_dp_rank_time_train_step(cfg: CMPSConfig, mesh: Mesh,
                                 optimizer=None, fused=None,
                                 num_microbatches: int = None):
    """Build (optimizer, jitted step) for the rho family on a
    (data, model, time) mesh — data parallelism x purification-rank TP x
    temporal pipelining, all three scaling axes in ONE jitted step:

      - batch rows shard over ``data`` (the gradient pmean rides it);
      - the purification rank's factor rows shard over ``model``
        (rank_parallel's megatron-style decomposition — the per-chunk
        partials gather, or the XLA path's per-step [2, b] psum, stays
        model-axis-local);
      - each waveform's time axis pipelines over ``time`` (the ancilla
        state hops stage-to-stage over ppermute, time-axis-local).

    `fused=None` auto-selects the FUSED temporal pipeline (carried-state
    rank-partials kernels at the LOCAL rank shard, one partials
    all_gather per tick) when the block layout applies and the per-shard
    chunk kernel fits VMEM; the fallback (and `fused=False`) is the XLA
    rank-sharded pipeline (any bond_dim). Both exact vs the
    single-device step (tests/test_parallel.py).

    step(params, opt_state, batch) with the make_dp_train_step contract
    (plain arrays in; the internal shard_map places them)."""
    if not {DATA_AXIS, MODEL_AXIS, TIME_AXIS} <= set(mesh.axis_names):
        raise ValueError(
            f"mesh must have ({DATA_AXIS!r}, {MODEL_AXIS!r}, "
            f"{TIME_AXIS!r}) axes (make_3d_mesh), got {mesh.axis_names}")
    optimizer = optimizer or make_optimizer(cfg)
    S = mesh.shape[TIME_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]

    def nll(params, cfg_, batch):
        if not hasattr(params, "Wx"):
            raise ValueError("the DP x rank x time step shards the "
                             "purification rank — a rho_mps strategy")
        B, T = batch.shape
        rank = params.Wx.shape[0]
        if rank % n_model:
            raise ValueError(
                f"purification rank {rank} must be divisible by the "
                f"{MODEL_AXIS!r} axis size {n_model}")
        r_loc = rank // n_model
        use_fused, M = resolve_fused_microbatches(
            cfg_, fused, num_microbatches, B, r_loc, S, n_data=n_data,
            structural=(T - 1) % S == 0)
        if use_fused:
            return rho_nll_pipelined_fused(
                params, cfg_, batch, mesh, num_microbatches=M,
                axis=TIME_AXIS, data_axis=DATA_AXIS, model_axis=MODEL_AXIS)
        return rho_nll_rank_pipelined(
            params, cfg_, batch, mesh, num_microbatches=M,
            axis=TIME_AXIS, model_axis=MODEL_AXIS, data_axis=DATA_AXIS)

    loss_fn = make_loss_fn("rho", cfg, nll=nll)

    def step_fn(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    return optimizer, step


def shard_batch_2d(batch, mesh: Mesh):
    """Place a [B, T] batch with rows sharded over the data axis (the
    time-sharded NLL re-shards the increment rows over time internally)."""
    from jax.sharding import NamedSharding
    s = NamedSharding(mesh, P(DATA_AXIS, None))
    return jax.device_put(batch, s)
