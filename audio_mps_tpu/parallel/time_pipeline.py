"""Temporal pipeline parallelism — the cMPS analogue of sequence/context
parallelism (SURVEY.md §2.4: "each chip owns a time chunk, boundary states
exchanged over ICI").

The cMPS recursion is strictly sequential in time, so the time axis cannot
be data-parallelized — but it CAN be pipelined: stage s of an S-stage mesh
owns the contiguous time-chunk [s*Tc, (s+1)*Tc) of every waveform, and the
(tiny — [b, D] or [b, rank, D]) ancilla state flows stage-to-stage over ICI
with `lax.ppermute`. With M microbatches the pipeline reaches steady state
after S-1 ticks, for an efficiency of M/(M+S-1) — the standard software
pipeline, applied to TIME rather than layers (the model has no layer stack
to pipeline, SURVEY.md §2.4 PP row).

Payload per hop: the rotating-frame ancilla plus the per-example running
NLL. Loss semantics are identical to the single-device scan (pinned by
tests on the virtual CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from .compat import shard_map

from ..config import CMPSConfig
from ..models import cell, core
from ..models.cell import make_constants

TIME_AXIS = "time"


def make_time_mesh(n_stages: int = None, axis_name: str = TIME_AXIS) -> Mesh:
    devices = jax.devices()
    if n_stages is not None:
        devices = devices[:n_stages]
    return Mesh(np.asarray(devices), (axis_name,))


def _pipeline_nll(step_fn, state0_fn, params, cfg: CMPSConfig, signals,
                  num_microbatches: int, mesh: Mesh, axis: str):
    """Generic pipelined NLL.

    step_fn(cc, cfg, carry, inc) -> carry, with carry = (state..., loss).
    state0_fn(params, cfg, b) -> initial carry state tuple for microbatch
    size b.
    """
    B, T = signals.shape
    M = num_microbatches
    S = mesh.devices.size
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    b = B // M
    n_steps = T - 1
    if n_steps % S:
        raise ValueError(f"T-1={n_steps} steps not divisible by {S} stages")
    Tc = n_steps // S

    cc = make_constants(params, cfg)
    incs = (signals[:, 1:] - signals[:, :-1])            # [B, T-1]
    # [M, b, S, Tc] -> time-major per stage [M, S, Tc, b]
    incs = incs.reshape(M, b, S, Tc).transpose(0, 2, 3, 1)

    # params/constants enter as replicated shard_map OPERANDS, not closure
    # captures: captured arrays keep their outer Auto-mesh avals inside
    # the Manual context and break the scan transpose once the step's
    # donated outputs (NamedSharding on this mesh) feed the next step
    def local(cc, params, incs_local):
        # incs_local: [M, 1, Tc, b] — this stage's chunk of every microbatch
        incs_local = incs_local[:, 0]                    # [M, Tc, b]
        s_idx = jax.lax.axis_index(axis)
        state0 = state0_fn(params, cfg, b)
        zero_loss = jnp.zeros((b,), signals.dtype)

        def chunk_scan(carry, chunk):                    # chunk [Tc, b]
            return jax.lax.scan(
                lambda c, x: (step_fn(cc, cfg, c, x), None), carry, chunk)[0]

        chunk_scan = jax.checkpoint(chunk_scan)

        def tick(acc, t):
            carry_in, losses = acc
            m = t - s_idx                                # active microbatch
            active = jnp.logical_and(m >= 0, m < M)
            m_c = jnp.clip(m, 0, M - 1)
            chunk = jax.lax.dynamic_index_in_dim(incs_local, m_c, axis=0,
                                                 keepdims=False)
            # stage 0 injects a fresh initial state for each new microbatch
            fresh = state0 + (zero_loss,)
            carry_in = jax.tree.map(
                lambda f, c: jnp.where(s_idx == 0, f, c), fresh, carry_in)
            carry_out = chunk_scan(carry_in, chunk)
            carry_out = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), carry_out, carry_in)
            # last stage banks the finished microbatch's loss
            done = jnp.logical_and(s_idx == S - 1, active)
            losses = jax.lax.cond(
                done,
                lambda ls: jax.lax.dynamic_update_index_in_dim(
                    ls, carry_out[-1], m_c, axis=0),
                lambda ls: ls, losses)
            # hand the state to the next stage over ICI
            perm = [(i, (i + 1) % S) for i in range(S)]
            carry_next = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), carry_out)
            return (carry_next, losses), None

        init_carry = state0 + (zero_loss,)
        losses0 = jnp.zeros((M, b), signals.dtype)
        (_, losses), _ = jax.lax.scan(tick, (init_carry, losses0),
                                      jnp.arange(M + S - 1))
        # finished losses live on the last stage; share them
        losses = jax.lax.psum(
            jnp.where(s_idx == S - 1, losses, jnp.zeros_like(losses)), axis)
        return jnp.mean(losses)[None]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None, None)),
        out_specs=P(axis),
        check=False)
    return jnp.mean(sharded(cc, params, incs))


def _psi_state0(params, cfg, b):
    pr, pi = core.psi0(params, cfg)
    return (jnp.broadcast_to(pr, (b,) + pr.shape),
            jnp.broadcast_to(pi, (b,) + pi.shape))


def psi_nll_pipelined(params, cfg: CMPSConfig, signals, mesh: Mesh,
                      num_microbatches: int = None, axis: str = TIME_AXIS):
    """Pure-state NLL with the time axis pipelined over `mesh`. Semantics
    of core.psi_nll (reference model.py:257-267)."""
    M = num_microbatches or signals.shape[0]
    return _pipeline_nll(cell.psi_loss_step, _psi_state0, params, cfg,
                         signals, M, mesh, axis)


def _rho_factor_state0(params, cfg, b):
    wr, wi = params.Wx, params.Wy
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    g0r = jnp.broadcast_to(wr * inv0, (b,) + wr.shape)
    g0i = jnp.broadcast_to(wi * inv0, (b,) + wi.shape)
    return (g0r, g0i)


def rho_nll_pipelined(params, cfg: CMPSConfig, signals, mesh: Mesh,
                      num_microbatches: int = None, axis: str = TIME_AXIS):
    """Mixed-state NLL (purification-factor form) with the time axis
    pipelined over `mesh`. Semantics of core.rho_nll (reference
    model.py:132-142)."""
    M = num_microbatches or signals.shape[0]
    return _pipeline_nll(cell.rho_factor_loss_step, _rho_factor_state0,
                         params, cfg, signals, M, mesh, axis)
