"""Purification-rank sharding — the rho family's tensor-parallel strategy.

SURVEY.md §2.4 leaves TP as "not needed at D<=128"; this closes the row
with the TPU-idiomatic decomposition for when D (and with it the default
purification rank) outgrows one chip's VMEM (the measured fused-kernel
ceiling: ops/pallas_grad.fused_supported — full-rank rho at B=8 stops
between D=192 and D=256 on v5e).

The key observation: the factor update ``G <- G U^dag`` (rho = G^dag G,
G of shape [B, rank, D]) is ROW-INDEPENDENT in the rank dimension — each
rank row evolves by the same right-multiplication. Sharding the rank rows
over a ``model`` mesh axis therefore needs NO per-step communication for
the state; only the two per-step scalars — the expectation
``e = sum Re(G . conj(G X))`` and the trace ``tr = ||G||_F^2`` — are sums
over rank rows, reduced with ONE fused `psum` of a [2, B] stack per step
(riding ICI). Compare classic megatron-style TP, which this mirrors: the
weight rows are sharded, activations stay local, and only the reduction
crosses chips.

The strategy composes with data parallelism on a 2D (data, model) mesh
the same way parallel/combined.py composes DP x time.

Exactness is pinned by tests/test_parallel.py and tests/test_pallas_rank.py
(values AND gradients equal the single-device factor scan; the W-shard
cotangents gather back through shard_map). Two hot-loop implementations:

- `rho_nll_rank_sharded` — XLA chunked-remat scan per shard, one [2, B]
  psum per step (the r1-r3 path; any bond_dim).
- `rho_nll_rank_sharded_fused` — the ops/pallas_rank partials kernels per
  shard with ONE all_gather of the whole [3, T-1, B] partial sequences
  (r4): the hot loop is fused Pallas AND the per-step collectives are
  gone, so beyond-ceiling training no longer pays the ~7x XLA-scan cliff
  (VERDICT r3 item 2). Train steps auto-select it via `fused=None`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .compat import shard_map

from ..config import CMPSConfig
from ..models import cell, core
from ..models.cell import make_constants

MODEL_AXIS = "model"


def make_model_mesh(n_devices: int = None, axis: str = MODEL_AXIS) -> Mesh:
    """1D mesh over the rank-sharding axis."""
    import numpy as np
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def _param_specs(params, axis: str):
    """PartitionSpec tree for the params pytree: W rows sharded over
    `axis`, everything else replicated."""
    def spec(path, leaf):
        name = getattr(path[-1], "name", str(path[-1]))
        return P(axis, None) if name in ("Wx", "Wy") else P()
    return jax.tree_util.tree_map_with_path(spec, params)


def rho_nll_rank_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = MODEL_AXIS,
                         data_axis: str = None):
    """Mean NLL of waveforms [B, T] with the purification rank sharded
    over `axis` (semantics of core.rho_nll_factor; reference hot loop:
    model.py:132-142). Differentiable — W-shard cotangents gather back to
    the full [rank, D] parameters, replicated-parameter cotangents sum
    across shards (shard_map's transpose handles both).

    `data_axis`: optional second mesh axis to ALSO shard the batch over —
    the combined DP x TP composition on a 2D (data, model) mesh (the
    rank psums stay axis-local; the final batch mean pmeans over data)."""
    rank = params.Wx.shape[0]
    n = mesh.shape[axis]
    if rank % n:
        raise ValueError(f"purification rank {rank} must be divisible by "
                         f"the {axis!r} axis size {n}")
    if data_axis is not None and signals.shape[0] % mesh.shape[data_axis]:
        raise ValueError(
            f"batch {signals.shape[0]} must be divisible by the "
            f"{data_axis!r} axis size {mesh.shape[data_axis]}")

    def local(p, sig):
        # p.Wx/p.Wy are the LOCAL rank rows; all other params replicated.
        # The hot loop is cell.rho_factor_loss_step — the ONE
        # transcription of the physics-critical step — with its `reduce`
        # hook bound to the model-axis psum: the e/tr partial sums (the
        # ONLY cross-shard traffic, one fused [2, B] psum per step) go
        # global, and state0's Frobenius trace likewise.
        cc = make_constants(p, cfg)
        incs = (sig[:, 1:] - sig[:, :-1]).T            # [T-1, B]
        B = sig.shape[0]
        red = partial(jax.lax.psum, axis_name=axis)
        gr, gi = cell.rho_factor_state0(p, cfg, B, reduce=red)
        step = partial(cell.rho_factor_loss_step, cc, cfg, reduce=red)

        carry = (gr, gi, jnp.zeros((B,), sig.dtype))
        _, _, loss = core.chunked_scan(step, carry, incs, cfg.scan_chunk)
        local_mean = jnp.mean(loss)
        if data_axis is not None:
            local_mean = jax.lax.pmean(local_mean, data_axis)
        return local_mean

    sig_spec = P() if data_axis is None else P(data_axis, None)
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(_param_specs(params, axis), sig_spec),
                        out_specs=P(), check=False)
    return sharded(params, signals)


def rho_nll_rank_sharded_fused(params, cfg: CMPSConfig, signals, mesh: Mesh,
                               axis: str = MODEL_AXIS,
                               data_axis: str = None,
                               precision: str = None,
                               unroll: int = None,
                               interpret: bool = None,
                               stream: bool = None):
    """Rank-sharded rho NLL with the FUSED Pallas hot loop (VERDICT r3
    item 2): each shard runs ops/pallas_rank's partials kernel over its
    local W rows, and the ONLY communication is a single all_gather of
    the [3, T-1, B] partial sequences (a few MB riding ICI) — versus the
    XLA path's one [2, B] psum per step AND its unfused scan. The global
    NLL is reconstructed from the gathered partials in the log domain
    (combine_rank_partials); values and gradients match the single-device
    fused path to fp reassociation (pinned by tests/test_parallel.py).

    `data_axis`: optional second mesh axis for the DP x TP composition
    (batch sharded over it; the gather stays model-axis-local)."""
    from ..ops.pallas_rank import (combine_rank_partials,
                                   rho_nll_rank_partials)

    rank = params.Wx.shape[0]
    n = mesh.shape[axis]
    if rank % n:
        raise ValueError(f"purification rank {rank} must be divisible by "
                         f"the {axis!r} axis size {n}")
    if data_axis is not None and signals.shape[0] % mesh.shape[data_axis]:
        raise ValueError(
            f"batch {signals.shape[0]} must be divisible by the "
            f"{data_axis!r} axis size {mesh.shape[data_axis]}")
    precision = precision or cfg.kernel_precision

    def local(p, sig):
        eh, trp, gam, seb = rho_nll_rank_partials(
            p, cfg, sig, unroll=unroll, interpret=interpret,
            precision=precision, stream=stream)
        gathered = jax.lax.all_gather(jnp.stack([eh, trp, gam]), axis)
        loss = combine_rank_partials(gathered[:, 0], gathered[:, 1],
                                     gathered[:, 2], seb, cfg)
        # the combine is replicated-by-value across the model axis; the
        # psum of 1/n both keeps the value and makes shard_map's
        # transpose exact (each shard contributes 1/n of the gathered
        # partials' cotangent, and the all_gather transpose sums them)
        loss = jax.lax.psum(loss / n, axis)
        if data_axis is not None:
            loss = jax.lax.pmean(loss, data_axis)
        return loss

    sig_spec = P() if data_axis is None else P(data_axis, None)
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(_param_specs(params, axis), sig_spec),
                        out_specs=P(), check=False)
    return sharded(params, signals)


def _auto_fused(cfg: CMPSConfig, params, per_shard_batch: int,
                n_model: int) -> bool:
    """The ONE auto-select gate for the fused rank-partials path, shared
    by the 1D and 2D rank train steps: real TPU + block layout + rank
    divisible over the model axis + per-shard partials kernel fits (VMEM
    checked at the lane-padded per-shard rank the kernel will actually
    run — auto_pad_rank_partials is identity when padding won't engage)."""
    from ..ops.pallas_block import supports_block
    from ..ops.pallas_rank import auto_pad_rank_partials, partials_supported
    rank = params.Wx.shape[0]
    return (jax.devices()[0].platform != "cpu"
            and supports_block(cfg)
            and rank % n_model == 0
            and partials_supported(
                cfg, per_shard_batch,
                auto_pad_rank_partials(cfg, per_shard_batch,
                                       rank // n_model, interpret=False)))


def make_rank_train_step(cfg: CMPSConfig, mesh: Mesh, optimizer=None,
                         axis: str = MODEL_AXIS, fused=None):
    """1D rank-TP training step for the rho family: W rows sharded over
    `axis`, batch replicated. `fused=None` auto-selects the fused
    partials path (rho_nll_rank_sharded_fused) when the block layout
    applies and the per-shard kernel fits VMEM; `fused=False` forces the
    XLA scan; `fused=True` raises if unsupported. step(params, opt_state,
    batch) with the make_dp_train_step contract (params/opt_state
    replicated-or-sharded jax arrays; optimizer update runs redundantly)."""
    import optax
    from ..training import make_loss_fn, make_optimizer

    optimizer = optimizer or make_optimizer(cfg)
    n = mesh.shape[axis]

    def nll(params, cfg_, batch):
        use_fused = fused
        if use_fused is None:
            use_fused = _auto_fused(cfg_, params, batch.shape[0], n)
        if use_fused:
            return rho_nll_rank_sharded_fused(params, cfg_, batch, mesh,
                                              axis=axis)
        return rho_nll_rank_sharded(params, cfg_, batch, mesh, axis=axis)

    loss_fn = make_loss_fn("rho", cfg, nll=nll)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return optimizer, step


def make_2d_rank_mesh(n_data: int, n_model: int,
                      data_axis: str = "data",
                      model_axis: str = MODEL_AXIS) -> Mesh:
    import numpy as np
    devices = np.array(jax.devices()[: n_data * n_model])
    return Mesh(devices.reshape(n_data, n_model), (data_axis, model_axis))


def make_dp_rank_train_step(cfg: CMPSConfig, mesh: Mesh, optimizer=None,
                            data_axis: str = "data",
                            model_axis: str = MODEL_AXIS, fused=None):
    """Combined 2D (data x model) mesh training for the rho family —
    DP x TP, the analogue of parallel/combined.py's DP x time
    composition. The loss internally shard_maps (batch over `data_axis`,
    rank rows over `model_axis`, rank psums axis-local) and
    `value_and_grad` runs OUTSIDE it, so shard_map's transpose produces
    the full global gradients (W shards gather, replicated-param
    contributions sum across every device); the optimizer update runs
    redundantly-replicated like the plain DP step. step(params,
    opt_state, batch) with the make_dp_train_step contract; pinned == the
    single-device step by tests/test_parallel.py."""
    import optax
    from functools import partial
    from ..training import make_loss_fn, make_optimizer

    optimizer = optimizer or make_optimizer(cfg)
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis]

    def _nll(params, cfg_, batch):
        use_fused = fused
        if use_fused is None:
            use_fused = (batch.shape[0] % n_data == 0
                         and _auto_fused(cfg_, params,
                                         batch.shape[0] // n_data, n_model))
        if use_fused:
            return rho_nll_rank_sharded_fused(
                params, cfg_, batch, mesh, axis=model_axis,
                data_axis=data_axis)
        return rho_nll_rank_sharded(params, cfg_, batch, mesh,
                                    axis=model_axis, data_axis=data_axis)

    loss_fn = make_loss_fn("rho", cfg, nll=_nll)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return optimizer, step
