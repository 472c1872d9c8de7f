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

Two hot-loop implementations per family:
- `psi_nll_pipelined` / `rho_nll_pipelined` — XLA chunked-remat scan per
  stage (the r1-r3 path; any bond_dim).
- `psi_nll_pipelined_fused` / `rho_nll_pipelined_fused` — the
  ops/pallas_rank carried-state chunk kernels per stage: each tick is ONE
  fused kernel call over the stage's whole time chunk, the hop payload is
  the kernel-frame state [2D, b*rank], and per-step losses are computed
  locally from the chunk's e/tr partials (single-group combine — exact).
  psi rides the SAME kernels as a rank-1 purification: G = conj(psi)^T
  evolves as G U^dag exactly when psi evolves as U psi, and e, the trace
  and the eps floors coincide (pinned by tests). This closes the last
  XLA-scan cliff in the strategy matrix (fused DP r2, fused rank-TP r4,
  fused time-pipeline here).
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
                  num_microbatches: int, mesh: Mesh, axis: str,
                  state0_stack=None, param_specs=None, data_axis=None):
    """Generic pipelined NLL.

    step_fn(cc, cfg, carry, inc) -> carry, with carry = (state..., loss).
    state0_fn(params, cfg, b) -> initial carry state tuple for microbatch
    size b (the same state for every microbatch). `state0_stack`
    overrides it with PER-EXAMPLE initial states: a tuple of [B, ...]
    arrays (e.g. the latent family's decoded per-example psi_0) — stage 0
    then injects each microbatch's own slice.

    `param_specs` (default all-replicated) lets a caller shard the params
    pytree over another mesh axis — step_fn/state0_fn then see the LOCAL
    shard and own whatever collectives make the math global (the
    rank-sharded pipeline's per-step [2, b] psum). `data_axis` shards
    each microbatch's examples over that mesh axis (the loss pmean rides
    it); not supported together with `state0_stack`.
    """
    if data_axis is not None and state0_stack:
        raise ValueError("data_axis with per-example initial states is "
                         "not supported on the XLA pipeline")
    B, T = signals.shape
    M = num_microbatches
    S = mesh.shape[axis]
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
    # per-example initial states, microbatch-major [M, b, ...]
    stack = (tuple(s.reshape((M, b) + s.shape[1:]) for s in state0_stack)
             if state0_stack else ())

    # params/constants enter as replicated shard_map OPERANDS, not closure
    # captures: captured arrays keep their outer Auto-mesh avals inside
    # the Manual context and break the scan transpose once the step's
    # donated outputs (NamedSharding on this mesh) feed the next step
    def local(cc, params, incs_local, *stack):
        # incs_local: [M, 1, Tc, b_l] — this stage's chunk of every
        # microbatch (b_l = b // data-axis size when data_axis is set)
        incs_local = incs_local[:, 0]                    # [M, Tc, b_l]
        b_l = incs_local.shape[-1]
        s_idx = jax.lax.axis_index(axis)
        if stack:
            def fresh_state(m_c):
                return tuple(jax.lax.dynamic_index_in_dim(
                    s, m_c, axis=0, keepdims=False) for s in stack)
            state_init = tuple(s[0] for s in stack)
        else:
            state0 = state0_fn(params, cfg, b_l)
            fresh_state = lambda m_c: state0
            state_init = state0
        zero_loss = jnp.zeros((b_l,), signals.dtype)

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
            fresh = fresh_state(m_c) + (zero_loss,)
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

        init_carry = state_init + (zero_loss,)
        losses0 = jnp.zeros((M, b_l), signals.dtype)
        (_, losses), _ = jax.lax.scan(tick, (init_carry, losses0),
                                      jnp.arange(M + S - 1))
        # finished losses live on the last stage; share them
        losses = jax.lax.psum(
            jnp.where(s_idx == S - 1, losses, jnp.zeros_like(losses)), axis)
        val = jnp.mean(losses)
        if data_axis is not None:
            val = jax.lax.pmean(val, data_axis)
        return val[None]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), param_specs if param_specs is not None else P(),
                  P(None, axis, None, data_axis)) + (P(),) * len(stack),
        out_specs=P(axis),
        check=False)
    return jnp.mean(sharded(cc, params, incs, *stack))


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


_rho_factor_state0 = cell.rho_factor_state0


def rho_nll_pipelined(params, cfg: CMPSConfig, signals, mesh: Mesh,
                      num_microbatches: int = None, axis: str = TIME_AXIS):
    """Mixed-state NLL (purification-factor form) with the time axis
    pipelined over `mesh`. Semantics of core.rho_nll (reference
    model.py:132-142)."""
    M = num_microbatches or signals.shape[0]
    return _pipeline_nll(cell.rho_factor_loss_step, _rho_factor_state0,
                         params, cfg, signals, M, mesh, axis)


def rho_nll_rank_pipelined(params, cfg: CMPSConfig, signals, mesh: Mesh,
                           num_microbatches: int = None,
                           axis: str = TIME_AXIS,
                           model_axis: str = "model",
                           data_axis: str = None):
    """Mixed-state NLL with the purification rank sharded over
    `model_axis` AND the time axis pipelined over `axis` — the XLA
    (any-bond_dim) TP x PP composition; with `data_axis` the full 3D
    DP x TP x PP mesh. Semantics of core.rho_nll (reference hot loop
    model.py:132-142).

    Each (model, time) shard carries its local factor rows through the
    pipeline; per step the only cross-shard traffic is rank_parallel's
    one [2, b] psum over `model_axis` (the e/tr partial sums), with the
    normalization global — cell.rho_factor_loss_step (the one
    transcription of the hot loop) with its `reduce` hook bound to the
    model-axis psum, inside the pipeline's tick machinery."""
    from functools import partial as _part
    from .rank_parallel import _param_specs
    rank = params.Wx.shape[0]
    n_model = mesh.shape[model_axis]
    if rank % n_model:
        raise ValueError(f"purification rank {rank} must be divisible by "
                         f"the {model_axis!r} axis size {n_model}")
    M = num_microbatches or signals.shape[0]
    red = _part(jax.lax.psum, axis_name=model_axis)
    step = _part(cell.rho_factor_loss_step, reduce=red)
    state0 = _part(cell.rho_factor_state0, reduce=red)
    return _pipeline_nll(step, state0, params, cfg, signals, M, mesh,
                         axis, param_specs=_param_specs(params, model_axis),
                         data_axis=data_axis)


# ---------------------------------------------------------------------------
# Fused-kernel pipeline (ops/pallas_rank carried-state chunk kernels)
# ---------------------------------------------------------------------------

def _fused_pipeline_plan(cfg: CMPSConfig, BR: int, Tc: int, live: int,
                         u: int, interpret: bool):
    """Backward-residual memory plan for the fused pipeline.

    Left alone, every live tick's kernel residuals — the state stream
    (stream mode) or one [2D, BR] block-entry checkpoint per unroll
    block — coexist in HBM until the backward (live = M + S - 1 ticks).
    The monolithic partials path bounds the same residuals with
    jax.checkpoint time segmentation (rho_nll_rank_partials /
    auto_time_segment); mirror that hierarchy here:

      1. the whole pipeline's stream fits STREAM_HBM_LIMIT -> stream,
         nothing rematerialized (the measured fast path, PIPEBENCH_r04);
      2. all live ticks' block-entry checkpoints fit SEGMENT_CK_BUDGET
         -> non-streamed, nothing rematerialized (kept ahead of the
         remat+stream plan: unmeasured, and remat re-runs each tick's
         forward during the backward);
      3. remat ticks (jax.checkpoint per tick: only the tiny tick-entry
         states persist; the backward recomputes one tick at a time),
         streaming if ONE tick's stream fits;
      4. remat ticks, non-streamed, if one tick's checkpoints fit;
      5. segment within the tick — a checkpointed scan of sub-chunk
         kernel calls in whole unroll blocks (carried chunks cannot
         tail-pad, see rank_partials_chunk_unroll) — preferring a
         stream-fitting divisor (measured on the monolithic path:
         segmentation is free and the streamed backward wins,
         RANKBENCH_r04).

    Returns (stream, remat_ticks, seg_steps); seg_steps=None means one
    kernel call per tick. kernel_stream="on" resolves at step 1 (forced
    streams skip budgets — the documented paging caveat); "off" falls
    through to the checkpoint budgets.
    """
    from ..ops.pallas_block import STREAM_HBM_LIMIT, auto_stream
    from ..ops.pallas_rank import SEGMENT_CK_BUDGET
    step_bytes = 8 * cfg.bond_dim * BR
    nb = Tc // u
    if auto_stream(cfg, BR, Tc * live + 1, True, interpret):
        return True, False, None
    if step_bytes * nb * live <= SEGMENT_CK_BUDGET:
        return False, False, None
    if auto_stream(cfg, BR, Tc + 1, True, interpret):
        return True, True, None
    if step_bytes * nb <= SEGMENT_CK_BUDGET:
        return False, True, None
    divs = [d for d in range(1, nb + 1) if nb % d == 0]
    if auto_stream(cfg, BR, u + 1, True, interpret):
        # structurally streamable: largest divisor whose sub-chunk
        # stream fits (the u+1-step probe just fit, so cap >= 1)
        cap = (STREAM_HBM_LIMIT // step_bytes - 1) // u
        seg = max((d for d in divs if d <= cap), default=0)
        if seg:
            return True, True, seg * u
    cap = max(1, SEGMENT_CK_BUDGET // step_bytes)
    seg = max((d for d in divs if d <= cap), default=1)
    return False, True, seg * u


def _sharded_chunk_nll(eh, tr, seb, gam_in, unroll: int, cfg: CMPSConfig,
                       axis: str, n_model: int):
    """Per-example NLL sum over one pipeline chunk with the factor rows
    SHARDED over `axis` — ops.pallas_rank.combine_rank_partials applied
    per chunk: each shard contributes its local (eh, trp) partials at its
    own absolute log-scale gamma, gathered ONCE per chunk over the model
    axis. gamma is carried tick-to-tick (`gam_in` [B] = log squared-norm
    of this shard's rows at the chunk's first block entry) and advanced
    by the chunk's block-exit log traces — the kernel renormalizes its
    local state by the LOCAL trace at every block exit, and gamma is
    exactly the bookkeeping that makes the cross-shard combine global
    (rho_nll_rank_partials' single-call analogue of this carry).

    The psum of 1/n keeps the (replicated-by-value) NLL and makes
    shard_map's transpose exact — each shard contributes 1/n of the
    gathered partials' cotangent and the all_gather transpose sums them
    (rank_parallel.rho_nll_rank_sharded_fused's rationale).

    Returns (nll [B], gam_out [B])."""
    L, B = eh.shape
    nb = L // unroll
    tr3 = tr.reshape(nb, unroll, B)
    trp = jnp.concatenate(
        [jnp.ones((nb, 1, B), tr.dtype), tr3[:, :unroll - 1]],
        axis=1).reshape(L, B)
    blk = jnp.log(jnp.maximum(tr3[:, unroll - 1], cfg.norm_eps))  # [nb, B]
    # gather the [2, L, B] eh/trp stream plus only the [nb+1, B] scale
    # seeds (gam_in + per-block log traces) — gamma is derivable from
    # them, so shipping it would grow the ONLY T-scaling cross-shard
    # traffic on this path by half for nothing
    g = jax.lax.all_gather(jnp.stack([eh, trp]), axis)       # [n, 2, L, B]
    sc = jax.lax.all_gather(
        jnp.concatenate([gam_in[None], blk], axis=0), axis)  # [n, nb+1, B]
    offs = jnp.concatenate(
        [jnp.zeros((n_model, 1, B), blk.dtype),
         jnp.cumsum(sc[:, 1:], axis=1)[:, :-1]], axis=1)     # [n, nb, B]
    gam = jnp.repeat(sc[:, :1] + offs, unroll, axis=1)       # [n, L, B]
    m = jnp.max(gam, axis=0)
    w = jnp.exp(gam - m[None])
    num = jnp.sum(g[:, 0] * w, axis=0)
    den = jnp.sum(g[:, 1] * w, axis=0)
    e = num / jnp.maximum(den, cfg.norm_eps)
    arg = 1.0 + e * seb
    if cfg.log_eps > 0:
        arg = jnp.maximum(arg, cfg.log_eps)
    nll = jax.lax.psum(jnp.sum(-jnp.log(arg), axis=0) / n_model, axis)
    return nll, gam_in + jnp.sum(blk, axis=0)


def _pipeline_nll_fused(w_pair, params, cfg: CMPSConfig, signals,
                        num_microbatches: int, mesh: Mesh, axis: str, *,
                        data_axis: str = None, model_axis: str = None,
                        unroll: int = None,
                        interpret: bool = None, precision: str = None,
                        stream: bool = None, remat_ticks: bool = None,
                        tick_segment: int = None):
    """Temporal pipeline with the FUSED hot loop: per tick each stage runs
    one carried-state rank-partials kernel call over its local time chunk
    (w_pair = local factor rows: params' W, or the rank-1 conj(psi)
    embedding) and banks the chunk's per-example NLL from the local
    partials. Identical tick/microbatch structure to `_pipeline_nll`.

    w_pair [r_loc, D]: factor rows shared across the batch. w_pair
    [B, r_loc, D]: PER-EXAMPLE rows (the latent family's decoded psi_0 as
    a rank-1 purification) — stage 0 injects each microbatch's own
    kernel-frame initial-state slice.

    `data_axis`: optional second mesh axis for the DP x pipeline
    composition — each microbatch's examples shard over it (the pipeline
    collectives stay `axis`-local; the loss pmean rides `data_axis`).

    `model_axis`: optional mesh axis sharding SHARED factor rows (the
    rho family's purification-rank TP, rank_parallel's decomposition)
    over the same mesh — the TP x PP composition, and with `data_axis`
    the full 3D DP x TP x PP mesh. Each shard carries its own rows'
    kernel-frame state through the pipeline plus a per-example log-scale
    gamma; per tick ONE all_gather of the chunk's [3, Tc, b] partials
    over `model_axis` reconstructs the global NLL exactly
    (`_sharded_chunk_nll`).

    `stream` / `remat_ticks` / `tick_segment`: all-None auto-resolves
    the backward-residual memory plan (`_fused_pipeline_plan`); any
    explicit value pins that leg (expert/test knobs — an explicit
    `stream=True` with the other two None keeps every live tick's
    stream resident, the pre-plan behavior)."""
    from ..ops.pallas_block import auto_stream
    from ..ops.pallas_rank import (rank_partials_chunk_factory,
                                   rank_partials_chunk_operands,
                                   rank_partials_chunk_ops,
                                   rank_partials_chunk_t0,
                                   rank_partials_chunk_nll,
                                   rank_partials_chunk_unroll,
                                   auto_pad_rank_partials, _on_tpu)

    B, T = signals.shape
    M = num_microbatches
    S = mesh.shape[axis]
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    b = B // M
    n_data = mesh.shape[data_axis] if data_axis is not None else 1
    if b % n_data:
        raise ValueError(
            f"microbatch size {b} must be divisible by the "
            f"{data_axis!r} axis size {n_data}")
    b_loc = b // n_data
    n_steps = T - 1
    if n_steps % S:
        raise ValueError(f"T-1={n_steps} steps not divisible by {S} stages")
    Tc = n_steps // S
    if interpret is None:
        interpret = not _on_tpu()
    precision = precision or cfg.kernel_precision
    per_example = w_pair[0].ndim == 3
    r_loc = w_pair[0].shape[-2]
    n_model = mesh.shape[model_axis] if model_axis is not None else 1
    if model_axis is not None:
        if per_example:
            raise ValueError(
                "model_axis shards shared factor rows over the mesh; "
                "per-example factors (the latent family's rank-1 psi_0) "
                "have nothing to shard")
        if r_loc % n_model:
            raise ValueError(
                f"purification rank {r_loc} must be divisible by the "
                f"{model_axis!r} axis size {n_model}")
        r_loc //= n_model
    r_pad = auto_pad_rank_partials(cfg, b_loc, r_loc, bool(interpret))
    if unroll is not None and Tc % unroll:
        raise ValueError(
            f"explicit unroll {unroll} must divide the stage chunk "
            f"{Tc} (carried-state chunks cannot tail-pad); leave "
            f"unroll=None for the auto divisor pick")
    u = rank_partials_chunk_unroll(cfg, b_loc, r_pad, Tc, unroll)
    BR = b_loc * r_pad
    if stream is None and remat_ticks is None and tick_segment is None:
        stream, remat_ticks, tick_segment = _fused_pipeline_plan(
            cfg, BR, Tc, M + S - 1, u, bool(interpret))
    if tick_segment is not None and (tick_segment < 1
                                     or Tc % tick_segment):
        raise ValueError(
            f"tick_segment {tick_segment} must be a positive divisor of "
            f"the stage chunk {Tc}")
    if tick_segment is not None and tick_segment % u:
        if unroll is not None:
            raise ValueError(
                f"tick_segment {tick_segment} must be whole explicit-"
                f"unroll blocks (unroll {unroll})")
        # the auto unroll was picked for the FULL stage chunk; a segment
        # that doesn't land on those block boundaries just needs the
        # pick re-made against the segment (the factory's
        # largest-divisor rule — auto-plan segments are always seg * u)
        u = rank_partials_chunk_unroll(cfg, b_loc, r_pad, tick_segment,
                                       None)
    # an explicit tick_segment ALWAYS checkpoints per segment (that is
    # what segmentation means here — even tick_segment == Tc degenerates
    # to a checkpointed whole tick), so one segment's residuals bound
    # the backward footprint
    seg_given = tick_segment is not None
    if stream is None:
        # manual remat/segment: only what one kernel call (times the
        # live ticks, if nothing rematerializes) holds must fit
        hold = 1 if (remat_ticks or seg_given) else M + S - 1
        stream = auto_stream(cfg, BR, (tick_segment or Tc) * hold + 1,
                             True, bool(interpret))
    seg_steps = tick_segment or Tc
    n_seg = Tc // seg_steps
    chunk_fn, r_pad, u = rank_partials_chunk_factory(
        cfg, b_loc, seg_steps, r_loc, unroll=u, interpret=interpret,
        precision=precision, stream=bool(stream))

    def tick_chunk(ops, t_in, seb_chunk):
        """One tick's chunk -> (t_out, per-example NLL sum). n_seg > 1
        runs a checkpointed scan of sub-chunk kernel calls so only one
        sub-chunk's residuals materialize during the backward (segments
        are whole unroll blocks, so the per-block trp/renormalization
        structure — hence the NLL — is unchanged)."""
        if not seg_given and n_seg == 1:
            t_out, (eh, tr) = chunk_fn(ops, t_in, seb_chunk)
            return t_out, rank_partials_chunk_nll(eh, tr, seb_chunk, u,
                                                  cfg)

        def seg_fn(t, se_seg):
            t2, (eh, tr) = chunk_fn(ops, t, se_seg)
            return t2, rank_partials_chunk_nll(eh, tr, se_seg, u, cfg)

        t_out, nlls = jax.lax.scan(
            jax.checkpoint(seg_fn), t_in,
            seb_chunk.reshape(n_seg, seg_steps, seb_chunk.shape[-1]))
        return t_out, jnp.sum(nlls, axis=0)

    def tick_chunk_sharded(ops, t_in, gam_in, seb_chunk):
        """Rank-sharded tick: local partials + carried gamma, combined
        globally per chunk (`_sharded_chunk_nll`). Same segmentation
        structure as `tick_chunk`."""
        if not seg_given and n_seg == 1:
            t_out, (eh, tr) = chunk_fn(ops, t_in, seb_chunk)
            nll, gam_out = _sharded_chunk_nll(eh, tr, seb_chunk, gam_in,
                                              u, cfg, model_axis, n_model)
            return t_out, gam_out, nll

        def seg_fn(carry, se_seg):
            t, gam = carry
            t2, (eh, tr) = chunk_fn(ops, t, se_seg)
            nll, gam2 = _sharded_chunk_nll(eh, tr, se_seg, gam, u, cfg,
                                           model_axis, n_model)
            return (t2, gam2), nll

        (t_out, gam_out), nlls = jax.lax.scan(
            jax.checkpoint(seg_fn), (t_in, gam_in),
            seb_chunk.reshape(n_seg, seg_steps, seb_chunk.shape[-1]))
        return t_out, gam_out, jnp.sum(nlls, axis=0)

    if remat_ticks and not seg_given:
        # per-tick remat: only the tiny tick-entry states persist across
        # ticks; the backward recomputes one tick's forward at a time
        # (segmented ticks already checkpoint per segment)
        tick_chunk = jax.checkpoint(tick_chunk)
        tick_chunk_sharded = jax.checkpoint(tick_chunk_sharded)

    cc = make_constants(params, cfg)
    # [B, T-1] signal increments / A (the partials' seb), chunked
    # [M, b, S, Tc] -> per stage, time-major [M, S, Tc, b]
    seb = (signals[:, 1:] - signals[:, :-1]) / cc.A
    seb = seb.reshape(M, b, S, Tc).transpose(0, 2, 3, 1)
    if per_example:
        # per-microbatch kernel-frame initial states [M, 2D, b*r_pad];
        # the example-major column blocks (r_pad columns each) make the
        # data_axis shard a contiguous column slice, matching seb's
        # example sharding
        wr_m = w_pair[0].reshape(M, b, r_loc, w_pair[0].shape[-1])
        wi_m = w_pair[1].reshape(M, b, r_loc, w_pair[1].shape[-1])
        t0_stack = jax.vmap(
            lambda a, c: rank_partials_chunk_t0(cc, a, c, cfg, r_pad))(
                wr_m, wi_m)
        t0_stack = t0_stack.reshape(M, t0_stack.shape[1], n_data,
                                    b_loc * r_pad)

    # params/constants as replicated shard_map OPERANDS (see
    # _pipeline_nll's note on captured outer-mesh avals)
    def local(cc, wr, wi, t0s, seb_local):
        seb_local = seb_local[:, 0]                  # [M, Tc, b_loc]
        s_idx = jax.lax.axis_index(axis)
        if per_example:
            ops = rank_partials_chunk_ops(cc, cfg, b_loc, r_pad)
            t0_l = t0s[:, :, 0, :]                   # [M, 2D, b_loc*r_pad]
            fresh_t0 = lambda m_c: jax.lax.dynamic_index_in_dim(
                t0_l, m_c, axis=0, keepdims=False)
            t_init = t0_l[0]
        else:
            ops, t0 = rank_partials_chunk_operands(cc, wr, wi, cfg, b_loc,
                                                   r_pad)
            fresh_t0 = lambda m_c: t0
            t_init = t0
        zero_loss = jnp.zeros((b_loc,), signals.dtype)
        if model_axis is not None:
            # this shard's absolute log-scale at injection: t0 is
            # locally unit-normalized, so gamma starts at log(local tr0)
            # (zero pad rows leave the trace unchanged)
            tr0 = jnp.sum(wr * wr + wi * wi)
            c0 = jnp.broadcast_to(
                jnp.log(jnp.maximum(tr0, cfg.norm_eps)), (b_loc,))

        def tick(acc, t):
            carry_in, losses = acc
            if model_axis is not None:
                tstate, gam_in, loss_in = carry_in
            else:
                tstate, loss_in = carry_in
            m = t - s_idx                            # active microbatch
            active = jnp.logical_and(m >= 0, m < M)
            m_c = jnp.clip(m, 0, M - 1)
            seb_c = jax.lax.dynamic_index_in_dim(seb_local, m_c, axis=0,
                                                 keepdims=False)  # [Tc, b]
            # stage 0 injects a fresh initial state per new microbatch
            tstate = jnp.where(s_idx == 0, fresh_t0(m_c), tstate)
            loss_in = jnp.where(s_idx == 0, zero_loss, loss_in)
            if model_axis is not None:
                gam_in = jnp.where(s_idx == 0, c0, gam_in)
                t_out, gam_out, nll_c = tick_chunk_sharded(ops, tstate,
                                                           gam_in, seb_c)
                gam_out = jnp.where(active, gam_out, gam_in)
            else:
                t_out, nll_c = tick_chunk(ops, tstate, seb_c)
            loss_out = loss_in + nll_c
            t_out = jnp.where(active, t_out, tstate)
            loss_out = jnp.where(active, loss_out, loss_in)
            # last stage banks the finished microbatch's loss
            done = jnp.logical_and(s_idx == S - 1, active)
            losses = jax.lax.cond(
                done,
                lambda ls: jax.lax.dynamic_update_index_in_dim(
                    ls, loss_out, m_c, axis=0),
                lambda ls: ls, losses)
            perm = [(i, (i + 1) % S) for i in range(S)]
            carry_out = ((t_out, gam_out, loss_out)
                         if model_axis is not None else (t_out, loss_out))
            carry_next = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), carry_out)
            return (carry_next, losses), None

        carry0 = ((t_init, c0, zero_loss) if model_axis is not None
                  else (t_init, zero_loss))
        init = (carry0, jnp.zeros((M, b_loc), signals.dtype))
        (_, losses), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        losses = jax.lax.psum(
            jnp.where(s_idx == S - 1, losses, jnp.zeros_like(losses)), axis)
        val = jnp.mean(losses)
        if data_axis is not None:
            val = jax.lax.pmean(val, data_axis)
        return val[None]

    if per_example:
        sharded = shard_map(
            lambda cc, t0s, seb_l: local(cc, None, None, t0s, seb_l),
            mesh=mesh,
            in_specs=(P(), P(None, None, data_axis, None),
                      P(None, axis, None, data_axis)),
            out_specs=P(axis),
            check=False)
        return jnp.mean(sharded(cc, t0_stack, seb))
    w_spec = P() if model_axis is None else P(model_axis, None)
    sharded = shard_map(
        lambda cc, wr, wi, seb_l: local(cc, wr, wi, None, seb_l),
        mesh=mesh,
        in_specs=(P(), w_spec, w_spec, P(None, axis, None, data_axis)),
        out_specs=P(axis),
        check=False)
    return jnp.mean(sharded(cc, w_pair[0], w_pair[1], seb))


def rho_nll_pipelined_fused(params, cfg: CMPSConfig, signals, mesh: Mesh,
                            num_microbatches: int = None,
                            axis: str = TIME_AXIS, **kw):
    """Mixed-state NLL, time axis pipelined over `mesh` with the FUSED
    hot loop (semantics of core.rho_nll, reference model.py:132-142):
    one carried-state partials kernel call per stage per tick.
    `model_axis=...` additionally shards the purification rank over that
    mesh axis (TP x PP; with `data_axis` the full 3D DP x TP x PP)."""
    M = num_microbatches or signals.shape[0]
    return _pipeline_nll_fused((params.Wx, params.Wy), params, cfg,
                               signals, M, mesh, axis, **kw)


def psi_nll_pipelined_fused(params, cfg: CMPSConfig, signals, mesh: Mesh,
                            num_microbatches: int = None,
                            axis: str = TIME_AXIS, **kw):
    """Pure-state NLL, time axis pipelined over `mesh` with the FUSED hot
    loop (semantics of core.psi_nll, reference model.py:257-267). psi is
    a rank-1 purification: the factor G = conj(psi)^T ([1, D] row)
    evolves as G U^dag exactly when psi evolves as U psi, with identical
    expectation (2 Re <psi|R|psi> = Re tr[(R+R^dag) psi psi^dag]), trace
    (|psi|^2) and eps-floor semantics — so the rho chunk kernels compute
    the psi NLL bit-for-bit (pinned by tests/test_parallel.py)."""
    M = num_microbatches or signals.shape[0]
    w = (params.psi_x[None, :], -params.psi_y[None, :])
    return _pipeline_nll_fused(w, params, cfg, signals, M, mesh, axis, **kw)


def latent_elbo_pipelined(params, cfg: CMPSConfig, signals, mesh: Mesh,
                          key=None, eps=None, beta: float = 1.0,
                          loss_type: str = "log",
                          num_microbatches: int = None, fused=None,
                          axis: str = TIME_AXIS, **kw):
    """Negative ELBO for the latent-conditioned family with the
    reconstruction NLL's time axis pipelined over `mesh` — semantics of
    models.latent.elbo_loss (the working completion of the reference's
    follow_vae.py), returns (loss, {"recon", "kl"}).

    The encoder/decoder MLPs run replicated outside the pipeline (they
    are ~free — the time mesh shards time, not examples, so the full
    batch is resident everywhere anyway); the decoded per-example psi_0
    enters the pipeline as a per-example rank-1 purification factor
    (stage 0 injects each microbatch's own initial states). `fused=None`
    auto-selects the carried-state partials kernels exactly like
    make_time_train_step; the quadratic reconstruction
    (follow_vae.py:69-70) is XLA-pipeline only, as in recon_loss."""
    from ..models import latent as latent_lib

    mu, logvar = latent_lib.encode(params, signals)
    if eps is None:
        if key is None:
            raise ValueError("latent_elbo_pipelined needs either `key` or "
                             "explicit `eps` (models.latent.elbo_loss "
                             "contract)")
        eps = jax.random.normal(key, mu.shape)
    z = mu + jnp.exp(0.5 * logvar) * eps
    pr, pi = latent_lib.decode_psi0(params, z, cfg)

    B, T = signals.shape
    S = mesh.shape[axis]
    M = num_microbatches or B
    data_axis = kw.pop("data_axis", None)
    n_data = mesh.shape[data_axis] if data_axis is not None else 1
    if fused is None:
        # the auto gate judges VMEM fit at the PER-DATA-SHARD microbatch
        # width when a data axis is given
        fused = (loss_type == "log"
                 and B % M == 0 and (B // M) % n_data == 0
                 and _auto_fused_pipeline(cfg, 1, B // M // n_data))
    if fused and loss_type != "log":
        raise ValueError("fused pipelined recon supports loss_type='log' "
                         "only (models.latent.recon_loss contract)")
    if fused:
        # G = conj(psi)^T per example: [B, 1, D] rank-1 factor rows
        recon = _pipeline_nll_fused((pr[:, None, :], -pi[:, None, :]),
                                    params, cfg, signals, M, mesh, axis,
                                    data_axis=data_axis, **kw)
    else:
        if kw:
            raise ValueError(
                f"fused-kernel knobs {sorted(kw)} require the fused "
                f"pipeline (fused=True)")
        # data_axis on the XLA path: the pipeline runs replicated over
        # it (exact, no DP speedup — there is no latent pscan)
        step_fn = (cell.psi_loss_step if loss_type == "log"
                   else latent_lib._psi_quadratic_step)
        recon = _pipeline_nll(step_fn, None, params, cfg, signals, M,
                              mesh, axis, state0_stack=(pr, pi))
    kl, kl_loss = latent_lib.kl_terms(mu, logvar,
                                      cfg.latent_free_bits)
    # the pipeline returns the batch-mean recon directly
    return (recon + beta * jnp.mean(kl_loss),
            {"recon": recon, "kl": jnp.mean(kl)})


def _auto_fused_pipeline(cfg: CMPSConfig, r_loc: int, b: int) -> bool:
    """Auto-select gate for the fused pipeline (mirrors
    rank_parallel._auto_fused): real TPU + block layout + the per-stage
    chunk kernel fits VMEM at the lane-padded local rank. Chunk LENGTH
    never gates selection: per-tick HBM residuals are bounded separately
    by `_fused_pipeline_plan` (remat/segmentation always yields a
    fitting plan)."""
    from ..ops.pallas_block import supports_block
    from ..ops.pallas_rank import (auto_pad_rank_partials,
                                   partials_supported)
    return (jax.devices()[0].platform != "cpu"
            and supports_block(cfg)
            and partials_supported(
                cfg, b, auto_pad_rank_partials(cfg, b, r_loc,
                                               interpret=False)))


def auto_microbatches(cfg: CMPSConfig, B: int, r_loc: int, S: int,
                      interpret: bool = False) -> int:
    """Microbatch count for the FUSED pipeline, from the measured tick
    cost model (PIPEBENCH_r04.json): a tick costs ~ a + c * lane_tiles
    with a ~= c on v5e (the per-step floor is worth about one 128-lane
    tile-pass; the model predicts the measured M=8/M=1 ratio 3.2 vs
    3.15). Wall-clock = (M+S-1) ticks x tick(B/M), so per-example
    microbatches (M=B) lose whenever they leave lane tiles half-empty —
    minimize (M+S-1) * (1 + tiles) over divisors M of B instead, where
    tiles counts the microbatch's PHYSICAL 128-lane tiles at the
    auto-padded local rank. Ties keep the smaller M — guaranteed by the
    ascending sweep + strict improvement (wider kernels amortize the
    per-step floor better). The XLA pipeline path keeps
    M=B: its per-step cost is linear in the microbatch width, so
    (M+S-1)/M is all that matters and M=B is optimal."""
    from ..ops.pallas_rank import auto_pad_rank_partials
    best, best_cost = B, None
    for m in range(1, B + 1):
        if B % m:
            continue
        b = B // m
        r_pad = auto_pad_rank_partials(cfg, b, r_loc, interpret)
        tiles = -(-b * r_pad // 128)
        cost = (m + S - 1) * (1 + tiles)
        if best_cost is None or cost < best_cost:
            best, best_cost = m, cost
    return best


def resolve_fused_microbatches(cfg: CMPSConfig, fused, M, B: int,
                               r_loc: int, S: int, n_data: int = 1,
                               structural: bool = True, extra: bool = True,
                               xla_default: int = None):
    """Shared fused-gate / microbatch resolution for every pipeline
    train-step factory (make_time_train_step, combined's DP x time and
    DP x rank x time steps, the latent step) — ONE place for the dance:

      - candidate M: the explicit value, else `auto_microbatches`' lane-
        tile-aware pick over the per-data-shard width (per-example
        microbatches that leave 128-lane tiles half-empty cost a full
        tick each — the measured cost model, PIPEBENCH_r04);
      - `fused=None` auto-selects iff `structural` (the caller's shape
        divisibility, e.g. (T-1) % S) and `extra` (family gates, e.g.
        the latent loss type) hold, the candidate divides B into whole
        data shards, and `_auto_fused_pipeline` accepts the resulting
        per-shard microbatch width; an explicit True/False is honored
        (True lets the fused path raise its own contract errors);
      - the XLA-fallback M: `xla_default`, else per-example per data
        shard (width-linear per-step cost — pipeline efficiency is all
        that matters there).

    Returns (use_fused, M)."""
    if M is not None and M < 1:
        raise ValueError(f"num_microbatches must be >= 1, got {M}")
    use_fused = fused
    if (use_fused or use_fused is None) and structural and B % n_data == 0:
        m_fused = (M if M is not None
                   else auto_microbatches(cfg, B // n_data, r_loc, S))
        if use_fused is None:
            use_fused = (extra and B % m_fused == 0
                         and (B // m_fused) % n_data == 0
                         and _auto_fused_pipeline(cfg, r_loc,
                                                  B // m_fused // n_data))
        if use_fused:
            M = m_fused
    elif use_fused is None:
        use_fused = False
    if M is None:
        M = xla_default if xla_default is not None else max(1, B // n_data)
    return use_fused, M


def make_time_train_step(mps_model: str, cfg: CMPSConfig, mesh: Mesh,
                         optimizer=None, num_microbatches: int = None,
                         fused=None, axis: str = TIME_AXIS):
    """Temporal-pipeline training step: the time axis sharded over `mesh`
    (batch and params replicated). Works for both model families.

    `num_microbatches=None` auto-picks: per-example (M = B — best
    pipeline efficiency M/(M+S-1), optimal for the width-linear XLA
    path) or, on the fused path, `auto_microbatches`'s lane-tile-aware
    pick (per-example microbatches that leave 128-lane tiles half-empty
    cost as much per tick as full ones — measured cost model in
    PIPEBENCH_r04.json). `fused=None` auto-selects the carried-state
    partials kernels (psi as its rank-1 purification) when the block
    layout applies and the per-stage chunk kernel fits VMEM; False forces
    the XLA chunk scan; True raises if unsupported. step(params,
    opt_state, batch) with the make_dp_train_step contract — except
    ``mps_model="latent"``, whose step takes an extra PRNG key (the
    make_train_step latent contract): its ELBO's reconstruction term
    rides the pipeline from per-example decoded psi_0
    (latent_elbo_pipelined)."""
    import optax
    from ..training import make_loss_fn, make_optimizer

    if mps_model not in ("rho_mps", "psi_mps", "latent"):
        raise ValueError(
            f"mps_model must be rho_mps, psi_mps or latent, "
            f"got {mps_model}")
    optimizer = optimizer or make_optimizer(cfg)
    S = mesh.shape[axis]

    if mps_model == "latent":
        return optimizer, _make_latent_time_step(
            cfg, mesh, optimizer, num_microbatches, fused, axis, S)

    def nll(params, cfg_, batch):
        is_rho = hasattr(params, "Wx")
        if is_rho != (mps_model == "rho_mps"):
            raise ValueError(
                f"params are for {'rho_mps' if is_rho else 'psi_mps'} but "
                f"the step was built for {mps_model}")
        B, T = batch.shape
        r_loc = params.Wx.shape[0] if is_rho else 1
        use_fused, M = resolve_fused_microbatches(
            cfg_, fused, num_microbatches, B, r_loc, S, xla_default=B)
        pipelined = {
            (True, True): rho_nll_pipelined_fused,
            (True, False): rho_nll_pipelined,
            (False, True): psi_nll_pipelined_fused,
            (False, False): psi_nll_pipelined,
        }[(is_rho, bool(use_fused))]
        return pipelined(params, cfg_, batch, mesh,
                         num_microbatches=M, axis=axis)

    loss_fn = make_loss_fn(mps_model, cfg, nll=nll)

    def step_fn(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    return optimizer, step


def _make_latent_time_step(cfg: CMPSConfig, mesh: Mesh, optimizer,
                           num_microbatches, fused, axis: str, S: int,
                           data_axis: str = None):
    """Temporal-pipeline ELBO step for the latent family —
    step(params, opt_state, batch, key), the make_train_step latent
    contract (metrics dict of training.make_latent_loss_fn).

    `data_axis`: optional second mesh axis (the DP x time composition,
    combined.make_dp_time_train_step): the FUSED path shards each
    microbatch's examples over it; the XLA fallback runs the pipeline
    replicated over that axis (correct, no DP speedup — there is no
    latent transfer-operator pscan)."""
    import optax
    from ..models import core

    n_data = mesh.shape[data_axis] if data_axis is not None else 1

    def loss_fn(params, batch, key):
        B, T = batch.shape
        use_fused, M = resolve_fused_microbatches(
            cfg, fused, num_microbatches, B, 1, S, n_data=n_data,
            extra=cfg.latent_loss == "log", xla_default=B)
        kw = ({"data_axis": data_axis}
              if (use_fused and data_axis is not None) else {})
        nll, aux = latent_elbo_pipelined(
            params, cfg, batch, mesh, key=key, beta=cfg.latent_beta,
            loss_type=cfg.latent_loss, num_microbatches=M,
            fused=bool(use_fused), axis=axis, **kw)
        total, (h_sq, r_sq) = core.regularized_loss(nll, params, cfg)
        return total, {"model_loss": nll, "total_loss": total,
                       "recon": aux["recon"], "kl": aux["kl"],
                       "h_l2sqnorm": h_sq, "r_l2sqnorm": r_sq,
                       "A": params.A}

    def step_fn(params, opt_state, batch, key):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))
