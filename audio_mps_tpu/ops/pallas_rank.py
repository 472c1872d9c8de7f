"""Rank-partials fused kernels: the rho family's scale-out/scale-up path.

The block-layout training kernels (ops/pallas_block.py) accumulate the
loss IN-kernel, which requires the full rank-group sums per step — that
is why (a) rank-sharded tensor parallelism previously had to ride the
7x-slower XLA scan (rank_parallel.py r3) and (b) the single-chip VMEM
ceiling stops full-rank rho between D=192 and D=256 (fused_supported).

This module restructures the kernel BOUNDARY instead of the math: the
purification-factor update ``G <- G U(s)^dag`` (rho = G^dag G) is
row-independent in the rank dimension, so a kernel that owns only a
SUBSET of the rank rows can evolve them exactly — all it cannot compute
is the cross-row sums (the per-step expectation and trace). The kernels
here therefore emit, per step, the per-example partial pair

    ehat[t] = sum_local-rows Re<row| X |row>   (block-entry scale)
    tr[t]   = sum_local-rows ||row||^2         (block-entry scale)

and renormalize the local rows by the LOCAL trace at each unroll-block
exit (the defer_norm trick: within a block the evolution is linear, so
normalization is a pure rescale and can be deferred/deterministically
undone). The global NLL is then reconstructed OUTSIDE the kernel, in
plain differentiable XLA, from every group's partial sequences combined
in the log domain:

    gamma^g[t] = absolute log ||local rows||^2 at block entry
               = log tr0^g + cumsum_blocks log tr^g[block exit]
    e[t] = sum_g ehat^g[t] e^{gamma^g - m} / sum_g trp^g[t] e^{gamma^g - m}
    loss = mean_B sum_t -log(max(1 + e[t] s[t], log_eps))

with m = max_g gamma^g (the logsumexp shift) and trp the previous step's
trace partial. e is exactly the expectation of the globally-normalized
state — the per-group local renormalizations cancel by construction —
so values and gradients match the single-kernel fused path to fp
reassociation (pinned by tests/test_parallel.py, tests/test_pallas_rank.py).

Two consumers:

- **rank-sharded TP** (parallel/rank_parallel.rho_nll_rank_sharded_fused):
  each chip runs ONE kernel over its rank shard; the only communication is
  a single all_gather of the [3, T-1, B] partials (a few MB) instead of
  the XLA path's 65k per-step psums — and, unlike the XLA path, the hot
  loop is the fused Pallas kernel.
- **single-chip rank chunking** (rho_nll_rank_chunked): beyond the
  fused_supported ceiling, split the rank rows into chunks that fit VMEM,
  run the same kernel per chunk, and combine — lifting the D-ceiling
  (full-rank D=256 runs as e.g. 4 chunks of 64 rows) with zero
  communication.

Gradients: the custom VJP takes STREAMED per-step cotangent rows
(d ehat, d tr) produced by autodiff of the combination math — the
backward kernel recomputes each block from its checkpoint (exactly like
the defer backward in pallas_block.py) and injects the streamed rows
where the in-kernel loss adjoint used to be.

Reference semantics anchored: model.py:132-203 (the rho hot loop);
the purification-factor form is core.rho_nll_factor (pinned == the
literal density-matrix transcription).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CMPSConfig
from ..models.cell import make_constants
from .pallas_block import (_dot, _make_dot_ops, _make_dot_ops_bwd,
                           _make_seg_dot, _rho_block_constants,
                           _rho_block_t0, supports_block)
from .pallas_grad import FUSED_VMEM_LIMIT, auto_unroll, fused_vmem_bytes
from .pallas_scan import _full, _on_tpu, _pad_rows


def _make_rank_partials_fwd_kernel(cfg: CMPSConfig, unroll: int,
                                   n_blocks: int, precision: str,
                                   stream: bool = False):
    """Forward: evolve the local rank rows (block layout, defer-norm
    within each unroll block, rotation folded into the constants) and
    stream the per-step (ehat, tr) per-example partial rows out.
    Hand-pipelined like the r3 forward kernels: step k's partial tail
    (expectation GEMM + stacked seg contraction) issues after step k+1's
    state dots.

    ``stream=True`` additionally streams every post-step state y_k to HBM
    (one static lane slice per step, off the dependent-dot path — the psi
    streamed-states trick) so the backward can drop its serial recompute
    chain entirely (_make_rank_partials_bwd_kernel_stream)."""
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)
    seg_prec = "highest" if precision == "high" else precision
    segdot = _make_seg_dot(precision)

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, xb_ref, z_ref, zt_ref,
               eh_ref, tr_ref, ck_ref, tfin_ref, *rest):
        ys_ref, t_s = (rest if stream else (None,) + rest)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        z, zt = z_ref[:], zt_ref[:]
        t = t_s[:]
        ck_ref[0] = t

        def tail(pend):
            y0, py0, k0 = pend
            gx0 = dotf(xb, py0)
            parts = jnp.concatenate(
                [jnp.sum(y0 * gx0, axis=0, keepdims=True),
                 jnp.sum(y0 * y0, axis=0, keepdims=True)], axis=0)
            red = segdot(parts, z)                 # [2, B]
            eh_ref[0, k0:k0 + 1, :] = red[0:1]
            tr_ref[0, k0:k0 + 1, :] = red[1:2]
            return red[1:2]

        BR = t.shape[1]
        tp = prep(t)
        pend = None
        tr_b = None
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            y = dotf(ab, tp) + s * dotf(bb, tp)
            if stream:
                ys_ref[0, :, k * BR:(k + 1) * BR] = y
            tp = prep(y)                # deferred chain: reused next step
            if pend is not None:
                tr_b = tail(pend)
            pend = (y, tp, k)
            t = y
        tr_b = tail(pend)
        inv_b = jax.lax.rsqrt(jnp.maximum(tr_b, norm_eps))
        t_out = t * _dot(inv_b, zt, seg_prec)
        t_s[:] = t_out

        # final (block-exit renormalized) state out — lets a time-segment
        # scan chain kernel calls with bounded checkpoint memory
        @pl.when(i == n_blocks - 1)
        def _emit_state():
            tfin_ref[:] = t_out

    return kernel


def _make_rank_partials_bwd_kernel(cfg: CMPSConfig, unroll: int,
                                   n_blocks: int, precision: str):
    """Adjoint with STREAMED per-step cotangent rows (d ehat, d tr) in
    place of the in-kernel loss adjoint. Same restructured reverse sweep
    as pallas_block._make_rho_bwd_kernel_defer: the recompute saves the
    prepped tp/pu/py operands, parameter cotangents use lane-contraction
    dotnt (no per-step transposes)."""
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr_op = _make_dot_ops(precision)
    segdot = _make_seg_dot(precision)

    def kernel(se_ref, deh_ref, dtr_ref, ck_ref, dtfin_ref,
               ab_ref, bb_ref, xb_ref, z_ref, zt_ref,
               dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
               dt_s, aab_s, abb_s, axb_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            # the final-state cotangent seeds the carry (zero when the
            # tfin output is unused)
            dt_s[:] = dtfin_ref[:]
            for ref in (aab_s, abb_s, axb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        abT, bbT, xbT = tr_op(ab), tr_op(bb), tr_op(xb)
        z, zt = z_ref[:], zt_ref[:]

        def seg_b(row):
            return segdot(row, z)

        def bcast(row_b):
            return segdot(row_b, zt)

        # --- recompute the unnormalized block chain from the checkpoint,
        # saving the PREPPED operands for the reverse sweep
        t = ck_ref[0]
        tp = prep(t)
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            pu = prep(s * t)
            y = dotf(ab, tp) + dotf(bb, pu)        # Ab t + Bb (s t)
            py = prep(y)
            saved.append((tp, pu, py, dotf(xb, py)))
            t = y                                   # defer: t_{k+1} = y_k
            tp = py
        tr_last = seg_b(jnp.sum(t * t, axis=0, keepdims=True))

        # --- block-exit renormalization adjoint seeds: the exit rescale
        # consumed tr[K-1], so its cotangent joins the streamed one
        dt_in = dt_s[:]
        inv_b = jax.lax.rsqrt(jnp.maximum(tr_last, norm_eps))
        dt = dt_in * bcast(inv_b)
        dinv_b = seg_b(jnp.sum(dt_in * t, axis=0, keepdims=True))
        dtr_exit = jnp.where(tr_last > norm_eps,
                             -0.5 * dinv_b * inv_b * inv_b * inv_b,
                             jnp.zeros_like(dinv_b))

        a_ab, a_bb, a_xb = aab_s[:], abb_s[:], axb_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            tp_k, pu_k, py_k, gx = saved[k]
            t_k = rec(tp_k)
            y = rec(py_k)
            deh_b = deh_ref[0, k:k + 1, :]
            dtr_b = dtr_ref[0, k:k + 1, :]
            if k == unroll - 1:
                dtr_b = dtr_b + dtr_exit
            # ONE stacked broadcast back to lanes per step
            rows = jnp.concatenate([dtr_b, deh_b], axis=0)
            lanes = bcast(rows)                    # [2, BR]
            dtr_l, deh_l = lanes[0:1], lanes[1:2]
            # ehat = sum(y * (Xb y)): dy += deh*(gx) + Xb^T (deh*y);
            # tr = sum(y*y): dy += 2 y dtr
            dy = dt + 2.0 * y * dtr_l + deh_l * gx
            dgx = deh_l * y
            pdgx = prep(dgx)
            dy = dy + dotf(xbT, pdgx)
            # y = Ab t + Bb u, u = s .* t
            pdy = prep(dy)
            du = dotf(bbT, pdy)
            dtn = dotf(abT, pdy) + s * du
            ds = jnp.sum(du * t_k, axis=0, keepdims=True)
            a_xb = a_xb + dotnt(pdgx, py_k)        # dgx @ y^T
            a_ab = a_ab + dotnt(pdy, tp_k)         # dy @ t^T
            a_bb = a_bb + dotnt(pdy, pu_k)         # dy @ u^T
            dse_ref[0, k:k + 1, :] = ds
            dt = dtn

        dt_s[:] = dt
        aab_s[:] = a_ab
        abb_s[:] = a_bb
        axb_s[:] = a_xb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            dxb_ref[:] = axb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


def _make_rank_partials_bwd_kernel_stream(cfg: CMPSConfig, unroll: int,
                                          n_blocks: int, precision: str):
    """STREAMED-STATES adjoint for the rank-partials kernel (round 4):
    the forward streamed every state y_k to HBM, so the serial recompute
    chain of _make_rank_partials_bwd_kernel disappears — the state buffer
    fills from the ys input, the expectation matvecs (Xb @ y, Xb^T @ dgx)
    and all three parameter cotangents run as per-block batched GEMMs,
    and all 2K streamed cotangent rows broadcast back to lanes in ONE
    stacked [2K,B]@[B,BR] seg dot. The only serial work left is the true
    adjoint recurrence (2 dependent dots/step) — exactly the structure
    that bought rho 1.18-1.35x in pallas_block."""
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr_op = _make_dot_ops(precision)
    segdot = _make_seg_dot(precision)
    K = unroll

    def kernel(se_ref, deh_ref, dtr_ref, ck_ref, ys_ref, dtfin_ref,
               ab_ref, bb_ref, xb_ref, z_ref, zt_ref,
               dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
               dt_s, aab_s, abb_s, axb_s, st_s, pu_s, dgx_s, dy_s,
               rows_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            dt_s[:] = dtfin_ref[:]
            for ref in (aab_s, abb_s, axb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        abT, bbT, xbT = tr_op(ab), tr_op(bb), tr_op(xb)
        z, zt = z_ref[:], zt_ref[:]

        # --- NO recompute spine: lane-assemble the shifted states from
        # the forward's stream (t_k = y_{k-1}; t_0 = block checkpoint)
        t0 = ck_ref[0]
        BR = t0.shape[1]
        st_s[:, 0:BR] = t0
        ys = ys_ref[0]                        # [2D, K*BR] streamed states
        if K > 1:
            st_s[:, BR:K * BR] = ys[:, :(K - 1) * BR]
        for k in range(K):
            s = se_ref[0, k:k + 1, :]
            pu_s[:, k * BR:(k + 1) * BR] = s * st_s[:, k * BR:(k + 1) * BR]

        # --- block-exit renormalization adjoint seeds: the exit rescale
        # consumed tr[K-1], so its cotangent joins the streamed one
        t_last = ys[:, (K - 1) * BR:]
        tr_last = segdot(jnp.sum(t_last * t_last, axis=0, keepdims=True), z)
        dt_in = dt_s[:]
        inv_b = jax.lax.rsqrt(jnp.maximum(tr_last, norm_eps))
        dt = dt_in * segdot(inv_b, zt)
        dinv_b = segdot(jnp.sum(dt_in * t_last, axis=0, keepdims=True), z)
        dtr_exit = jnp.where(tr_last > norm_eps,
                             -0.5 * dinv_b * inv_b * inv_b * inv_b,
                             jnp.zeros_like(dinv_b))

        # --- ONE stacked broadcast back to lanes for ALL 2K rows
        for k in range(K):
            dtr_b = dtr_ref[0, k:k + 1, :]
            if k == K - 1:
                dtr_b = dtr_b + dtr_exit
            rows_s[k:k + 1, :] = dtr_b
            rows_s[K + k:K + k + 1, :] = deh_ref[0, k:k + 1, :]
        lanes = segdot(rows_s[:], zt)                       # [2K, BR]

        # --- batched expectation-path work (all forward-computable)
        PY = prep(ys)
        gx_all = dotf(xb, PY)
        for k in range(K):
            dgx_s[:, k * BR:(k + 1) * BR] = \
                lanes[K + k:K + k + 1] * ys[:, k * BR:(k + 1) * BR]
        pdgx_all = prep(dgx_s[:])
        xbtdgx_all = dotf(xbT, pdgx_all)

        # --- serial adjoint chain: 2 dependent dots per step
        for k in reversed(range(K)):
            y = ys[:, k * BR:(k + 1) * BR]
            # ehat = sum(y * (Xb y)): dy += deh*gx + Xb^T (deh*y);
            # tr = sum(y*y): dy += 2 y dtr
            c = (2.0 * y * lanes[k:k + 1]
                 + lanes[K + k:K + k + 1] * gx_all[:, k * BR:(k + 1) * BR]
                 + xbtdgx_all[:, k * BR:(k + 1) * BR])
            dy = dt + c
            dy_s[:, k * BR:(k + 1) * BR] = dy
            pdy = prep(dy)
            du = dotf(bbT, pdy)
            s = se_ref[0, k:k + 1, :]
            dtn = dotf(abT, pdy) + s * du
            t_k = st_s[:, k * BR:(k + 1) * BR]
            dse_ref[0, k:k + 1, :] = jnp.sum(du * t_k, axis=0,
                                             keepdims=True)
            dt = dtn

        # --- batched parameter-cotangent accumulations
        pdy_all = prep(dy_s[:])
        aab_s[:] = aab_s[:] + dotnt(pdy_all, prep(st_s[:]))
        abb_s[:] = abb_s[:] + dotnt(pdy_all, prep(pu_s[:]))
        axb_s[:] = axb_s[:] + dotnt(pdgx_all, PY)
        dt_s[:] = dt

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            dxb_ref[:] = axb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


@functools.lru_cache(maxsize=64)
def _rank_partials_factory(cfg: CMPSConfig, B: int, T: int, r_loc: int,
                           unroll: int, interpret: bool, precision: str,
                           stream: bool = False):
    """custom_vjp fused fn (ab, bb, xb, t0, se, z, zt) ->
    (ehat [t_pad, B], tr [t_pad, B], t_fin [2D, BR]) whose VJP consumes
    per-step cotangent rows for the partials plus the final-state
    cotangent (zero when t_fin is unused — the single-shot case)."""
    D2 = 2 * cfg.bond_dim
    BR = B * r_loc
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    fwd_kernel = _make_rank_partials_fwd_kernel(cfg, unroll, n_blocks,
                                                precision, stream)
    bwd_kernel = (_make_rank_partials_bwd_kernel_stream(cfg, unroll,
                                                        n_blocks, precision)
                  if stream else
                  _make_rank_partials_bwd_kernel(cfg, unroll, n_blocks,
                                                 precision))
    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)

    def run_fwd(ab, bb, xb, t0, se, z, zt):
        se3 = se.reshape(n_blocks, unroll, BR)
        out_specs = [
            pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D2, BR), lambda i: (i, 0, 0)),
            _full((D2, BR)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_blocks, unroll, B), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, unroll, B), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, D2, BR), jnp.float32),
            jax.ShapeDtypeStruct((D2, BR), jnp.float32),
        ]
        if stream:
            out_specs.append(
                pl.BlockSpec((1, D2, unroll * BR), lambda i: (i, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((n_blocks, D2, unroll * BR),
                                     jnp.float32))
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, BR), lambda i: (i, 0, 0)),
                _full((D2, BR)),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((BR, B)), _full((B, BR)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((D2, BR), jnp.float32)],
            compiler_params=sem,
            interpret=interpret,
        )(se3, t0, ab, bb, xb, z, zt)
        eh, trr, ck, tfin = outs[:4]
        return ((eh.reshape(t_pad, B), trr.reshape(t_pad, B), ck, tfin)
                + ((outs[4],) if stream else ()))

    def run_bwd(ab, bb, xb, se, z, zt, ck, deh, dtr, dtfin, ys=None):
        rev3 = lambda i: (n_blocks - 1 - i, 0, 0)
        se3 = se.reshape(n_blocks, unroll, BR)
        deh3 = deh.reshape(n_blocks, unroll, B)
        dtr3 = dtr.reshape(n_blocks, unroll, B)
        in_specs = [
            pl.BlockSpec((1, unroll, BR), rev3),
            pl.BlockSpec((1, unroll, B), rev3),
            pl.BlockSpec((1, unroll, B), rev3),
            pl.BlockSpec((1, D2, BR), rev3),
            _full((D2, BR)),
            _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
            _full((BR, B)), _full((B, BR)),
        ]
        args = (se3, deh3, dtr3, ck, dtfin, ab, bb, xb, z, zt)
        scratch = [
            pltpu.VMEM((D2, BR), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
        ]
        if stream:
            in_specs.insert(4, pl.BlockSpec((1, D2, unroll * BR), rev3))
            args = (se3, deh3, dtr3, ck, ys, dtfin, ab, bb, xb, z, zt)
            scratch += [
                pltpu.VMEM((D2, unroll * BR), jnp.float32),  # shifted states
                pltpu.VMEM((D2, unroll * BR), jnp.float32),  # s*t
                pltpu.VMEM((D2, unroll * BR), jnp.float32),  # dgx
                pltpu.VMEM((D2, unroll * BR), jnp.float32),  # dy
                pltpu.VMEM((2 * unroll, B), jnp.float32),    # cotangent rows
            ]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, unroll, BR), rev3),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((D2, BR)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, unroll, BR), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, BR), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=sem,
            interpret=interpret,
        )(*args)
        return (outs[0].reshape(t_pad, BR),) + tuple(outs[1:])

    @jax.custom_vjp
    def fused(ab, bb, xb, t0, se, z, zt):
        outs = run_fwd(ab, bb, xb, t0, se, z, zt)
        return outs[0], outs[1], outs[3]

    def fused_fwd(ab, bb, xb, t0, se, z, zt):
        outs = run_fwd(ab, bb, xb, t0, se, z, zt)
        return ((outs[0], outs[1], outs[3]),
                (ab, bb, xb, se, z, zt, outs[2])
                + ((outs[4],) if stream else ()))

    def fused_bwd(res, g):
        ab, bb, xb, se, z, zt, ck = res[:7]
        ys = res[7] if stream else None
        deh, dtr, dtfin = g
        dse, dab, dbb, dxb, dt0 = run_bwd(ab, bb, xb, se, z, zt, ck,
                                          deh, dtr, dtfin, ys)
        return (dab, dbb, dxb, dt0, dse,
                jnp.zeros_like(z), jnp.zeros_like(zt))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


# Three-coefficient real-VMEM model for the partials backward, fitted to
# EVERY measured boundary point (r4 + two rounds of r5 chip probes,
# tools/bigd_bench.py / /tmp/frontier_probe): real scoped-VMEM usage
# scales ~3.4x on the lane-proportional live set, ~1.8x on the
# [2D,2D]-constant block, and ~1.1x on the extra per-unrolled-step
# [2D,2D] term beyond the minimum unroll of 2. Anchors
# (lane MB, const MB -> predicted MB at these coefficients, outcome):
#   D=256 B=8 c=128  (25.2, 10.5) -> 104.6  OOM (measured 105.25M)
#   D=256 B=8 c=64   (12.6, 10.5) ->  61.7  runs (r4 production)
#   D=320 B=4 c=160  (19.7, 16.4) ->  96.5  runs
#   D=384 B=4 c=96   (14.2, 23.6) ->  90.8  runs
#   D=448 B=4 c=64   (11.0, 32.1) ->  95.2  runs
#   D=512 B=4 c=32   ( 6.3, 41.9) ->  96.8  runs  <- the D=512 frontier
#   D=512 B=4 c=64   (12.6, 41.9) -> 118.2  helper-500 (scoped OOM)
#   D=576 B=4 c=24   ( 5.3, 50.6) -> 109.1  helper-500
#   D=448 B=4 c=8 u=12 (unroll excess 30.6) -> 110.9  OOM (109.96M)
# The 97 MB budget admits every measured-OK point (the tightest sit at
# 95-97) and rejects every measured failure (nearest at 104.6); anything
# unmeasured that lands in the 97-104 gap is rejected — the conservative
# side of a helper crash.
PARTIALS_REAL_VMEM_LIMIT = 97 * 1024 * 1024


def partials_real_vmem_bytes(bond_dim: int, cols: int,
                             unroll: int = 2) -> float:
    """The three terms: lane-proportional live set, the ~10 resident
    [2D,2D] constants/accumulators, and the per-EXTRA-unrolled-step
    [2D,2D] contribution the backward keeps live beyond the minimum
    unroll of 2 — the term the r5 OOM exposed (D=448 cols=32 at the
    D-blind auto unroll of 12 needed 109.96M where unroll 2 fits)."""
    d2 = 2 * bond_dim
    lane = (unroll + 1) * (4 * d2 * cols * 4) + unroll * cols * 8
    const = 10 * d2 * d2 * 4
    excess = max(0, unroll - 2) * d2 * d2 * 4
    return 3.4 * lane + 1.8 * const + 1.1 * excess


# The unroll CLAMP uses a tighter ceiling than the admit/reject budget:
# the excess-unroll coefficient is fitted to a single OOM anchor (D=448
# cols=32 auto-unroll-12 -> measured 109.96M), so expanded-unroll picks
# keep an extra ~10% margin below the admit budget.
PARTIALS_UNROLL_CLAMP_LIMIT = 88 * 1024 * 1024


def partials_unroll(bond_dim: int, cols: int,
                    unroll: Optional[int]) -> int:
    """auto_unroll clamped by the real-VMEM model: auto_unroll budgets
    only the [2D, cols] live set, which at large bond_dim lets the
    per-step [2D,2D] terms blow the scoped limit (measured r5, above).
    The auto pick shrinks until the model fits (floor 2 — the guard
    already rejected anything that misses there); an EXPLICIT unroll is
    honored and surfaces the backend's own OOM if oversized."""
    if unroll is not None:
        return unroll
    u = auto_unroll(2 * bond_dim, cols, None)
    while u > 2 and partials_real_vmem_bytes(bond_dim, cols, u) \
            > PARTIALS_UNROLL_CLAMP_LIMIT:
        u -= 1
    return u


def partials_supported(cfg: CMPSConfig, batch: int, r_loc: int) -> bool:
    """Does the partials backward fit VMEM at (D, B, r_loc)? Same live-set
    STRUCTURE as the single-kernel defer backward (fused_vmem_bytes with
    cols = B * r_loc), but judged by the fitted real-usage model above —
    a single scalar budget on the raw estimate cannot represent the
    measured boundary, which is lane-heavy in one regime (B=8 rank
    chunks) and constant-heavy in the other (large bond_dim).

    The hard bond_dim cap is the measured compile frontier: D=512
    (chunk 32) compiles and runs; D=576 dies in the compile helper even
    at predicted-in-budget tiny chunks' const-dominated regime — the
    model's extrapolation is not trustworthy past the last measured
    point, so the cap stays at it."""
    if cfg.bond_dim > 512:
        return False
    return partials_real_vmem_bytes(cfg.bond_dim, batch * r_loc, 2) \
        <= PARTIALS_REAL_VMEM_LIMIT


def auto_pad_rank_partials(cfg: CMPSConfig, B: int, r_loc: int,
                           interpret: bool) -> int:
    """Lane padding for the rank-partials kernels: pad the LOCAL factor
    rows (a TP shard, a rank chunk, or the full rank) with zero rows so
    B*r_loc reaches the next multiple of 128 — the partials analogue of
    pallas_block.auto_pad_rank. Zero rows are exactly zero through the
    linear factor update, contribute nothing to the local e/tr partial
    sums, and leave tr0 (hence gamma's absolute log-scale) unchanged, so
    values and gradients are exact. No defer_norm restriction: the
    partials kernel renormalizes by per-example traces and the combiner
    uses sums, never a 1/(B*rank) count.

    Policy matches auto_pad_cols/auto_pad_rank ("off" never; "on" always,
    incl. under interpret for CPU tests; "auto" on real TPU when the pad
    would unlock the streamed-states kernels — alignment is the only
    structural blocker since auto_time_segment bounds the segment to fit
    the stream HBM budget — and the padded shape still fits VMEM)."""
    mode = cfg.kernel_pad_lanes
    if mode == "off" or (B * r_loc) % 128 == 0:
        return r_loc
    m = 128 // math.gcd(B, 128)
    r_p = -(-r_loc // m) * m
    if mode == "on":
        return r_p
    # no cfg.defer_norm gate: the partials path resolves auto_stream with
    # defer_norm=True (the kernel is inherently defer-style), so the
    # stream unlock is available regardless of the monolithic-path knob
    if interpret or cfg.kernel_stream == "off":
        return r_loc
    if -(-B * r_p // 128) != -(-B * r_loc // 128):
        # the uniform per-example pad overshoots the 128-lane tile
        # ceiling (non-power-of-2 B, e.g. B=12 r=8: 96 -> 384 lanes =
        # 1 -> 3 MXU tiles): every dot would pay REAL extra passes, not
        # hardware-padded-anyway lanes — measured a 1.65-1.83x LOSS
        # despite the stream unlock (PADRANK_r04.json overshoot rows);
        # auto declines, "on" still forces. NOTE: the monolithic-kernel
        # pad (pallas_block.auto_pad_rank) accepts small-D overshoots —
        # its D=8 forced pad measured a 0.885x WIN — but that win does
        # NOT transfer to this partials family: chip A/B at the same
        # shape through rho_nll_rank_chunked (rank_chunk=8, B=12,
        # bf16x3, T=16385) measured the forced pad LOSING 1.095x
        # (24.50 vs 22.38 ms), so the partials decline stays
        # unconditional (review r5).
        return r_loc
    if not partials_supported(cfg, B, r_p):
        return r_loc
    return r_p


def chunked_stream_viable(cfg: CMPSConfig, batch: int,
                          rank_chunk: int) -> bool:
    """Will the streamed-states path engage for a rank-chunked run with
    stream/time_segment left to auto (on a real TPU)? Mirrors the
    structural gates auto_time_segment / pallas_block.auto_stream apply
    (stream mode, defer_norm, lane alignment); the HBM budgets are
    satisfied by auto segmentation whenever >= 2 unroll blocks exist, so
    they are not re-checked here. training.nll_fn_for consults this to
    decide whether beyond-ceiling fp32 'highest' stays on the chunked
    kernel (measured faster than the XLA scan only when streamed —
    tools/rankstream_bench.py) or falls back to the XLA scan.

    Pad-aware: a misaligned chunk still streams when lane padding will
    align it (auto_pad_rank_partials resolves inside the partials run)."""
    if cfg.kernel_stream == "off" or not cfg.defer_norm:
        return False
    r_eff = auto_pad_rank_partials(cfg, batch, rank_chunk,
                                   interpret=False)
    return (batch * r_eff) % 128 == 0


def rank_chunk_for(cfg: CMPSConfig, batch: int, rank: int) -> Optional[int]:
    """Largest divisor of `rank` whose partials kernel fits VMEM (None if
    even a single row does not fit — then only bond-dim reduction helps).

    VMEM is checked at the chunk size the kernel will actually run —
    after lane padding resolves (auto_pad_rank_partials returns the
    chunk unchanged whenever padding won't engage)."""
    for c in sorted((c for c in range(1, rank + 1) if rank % c == 0),
                    reverse=True):
        if partials_supported(
                cfg, batch,
                auto_pad_rank_partials(cfg, batch, c, interpret=False)):
            return c
    return None


# Per-kernel-call budget for the HBM the backward checkpoints occupy
# (one [2D, B*r_loc] block-entry state per unroll block): past it the
# partials run segments the TIME axis — lax.scan of kernel calls chained
# through the t_fin state output, jax.checkpoint'd so only ONE segment's
# checkpoints materialize during the backward (full-rank D=256 at the
# reference T=2^16 would otherwise need ~137 GB of residuals).
SEGMENT_CK_BUDGET = 1 << 30


def auto_time_segment(cfg: CMPSConfig, D2: int, BR: int, n_blocks: int,
                      unroll: int, *, stream: Optional[bool],
                      interpret: bool, hbm_groups: int) -> Optional[int]:
    """Resolve time_segment=None: steps per kernel call, or None to run
    the whole sequence in one call.

    Two budgets bound the per-call block count:
      - SEGMENT_CK_BUDGET on the backward's block-entry checkpoints
        (one [2D, BR] state per unroll block);
      - when the streamed-states kernels are viable (auto mode, aligned
        lanes, real TPU) but the WHOLE run's state stream would bust the
        HBM budget, the segment is also bounded so ONE segment's stream
        fits — auto_stream then enables streaming on the segmented run.
        Measured (tools/rankstream_bench.py, D=256 full-rank chunked,
        T=16385, v5e): segmentation itself is free (baseseg == base
        within noise) and the streamed backward then wins 1.15x, so a
        stream-fitting segment beats a larger unstreamed one.

    Prefers an even division (no tail padding) when a divisor of
    n_blocks lands within 2x of the budget; a prime-ish n_blocks falls
    back to the raw budget with tail padding."""
    blocks_budget = max(1, SEGMENT_CK_BUDGET // (D2 * BR * 4))
    # kernel_stream="on" forces streaming wherever structurally
    # supported; with time_segment left to us, bounding the segment so
    # the stream fits is strictly better than letting a forced
    # over-budget stream page (the documented 15x paging caveat)
    if (stream is None and cfg.kernel_stream in ("auto", "on")
            and not interpret and BR % 128 == 0):
        from .pallas_block import STREAM_HBM_LIMIT
        per_step = D2 * BR * 4
        groups = max(1, hbm_groups)
        if per_step * (n_blocks * unroll + 1) * groups > STREAM_HBM_LIMIT:
            stream_blocks = int((STREAM_HBM_LIMIT // per_step - 1)
                                // unroll)
            if stream_blocks >= 1:
                cap = stream_blocks
                if groups > 1 and n_blocks >= 2:
                    # the COMBINED sibling-chunk streams bust the budget
                    # even when one chunk's whole-run stream would fit:
                    # force >= 2 checkpointed segments so only one
                    # segment's stream is ever live (groups collapse to
                    # 1 under segmentation — see the stream resolution
                    # in rho_nll_rank_partials)
                    cap = min(cap, max(1, n_blocks // 2))
                blocks_budget = min(blocks_budget, cap)
    if n_blocks <= blocks_budget:
        return None
    seg_pick = max((d for d in range(1, blocks_budget + 1)
                    if n_blocks % d == 0), default=blocks_budget)
    if 2 * seg_pick >= blocks_budget:
        blocks_budget = seg_pick
    return blocks_budget * unroll


def rho_nll_rank_partials(params, cfg: CMPSConfig, signals, *,
                          unroll: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          precision: str = "highest",
                          time_segment: Optional[int] = None,
                          stream: Optional[bool] = None,
                          hbm_groups: int = 1):
    """Run the partials kernel on params' (local) W rows.

    Returns (ehat, trp, gamma, seb), each [T-1, B]:
      ehat  — per-step expectation partial sums (block-entry scale)
      trp   — PREVIOUS step's trace partial (1.0 at block entries)
      gamma — absolute log squared-norm of the local rows at each step's
              block entry (log tr0 + cumulative block-exit log traces)
      seb   — per-example signal increments / A (the combiner's s)
    Feed stacked groups to `combine_rank_partials` for the global NLL.

    `time_segment`: steps per kernel call (rounded up to a whole number
    of unroll blocks); None auto-segments when the checkpoint HBM would
    exceed SEGMENT_CK_BUDGET — or, when streaming is viable but the
    whole run's state stream would bust the HBM budget, to a
    stream-fitting segment so auto_stream can stay ON (auto_time_segment
    has the measured rationale). Segmentation is exact — the kernel
    renormalizes at every block exit anyway, so segment boundaries are
    just block boundaries with the state carried through t_fin.

    `stream`: None auto-enables the streamed-states kernels (the forward
    streams every per-step state to HBM; the backward drops its serial
    recompute chain — pallas_block.auto_stream's gate on B*r_loc columns,
    with the HBM budget applied per time segment since jax.checkpoint
    keeps only one segment's stream alive during the backward).

    `hbm_groups`: how many sibling partials runs hold their residual
    streams alive at once (the chunked path's n_chunks — every chunk's
    forward residuals live until its backward unless time segmentation
    checkpoints them away); scales the auto-stream HBM budget only.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"rank-partials kernels use the block layout "
            f"(bond_dim % 4 == 0), got bond_dim={cfg.bond_dim}")
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    r_loc = params.Wx.shape[0]
    r_pad = auto_pad_rank_partials(cfg, B, r_loc, bool(interpret))
    unroll = partials_unroll(D, B * r_pad, unroll)
    n_steps = T - 1
    D2, BR = 2 * D, B * r_pad
    n_blocks = max(1, -(-n_steps // unroll))

    if time_segment is None:
        time_segment = auto_time_segment(
            cfg, D2, BR, n_blocks, unroll, stream=stream,
            interpret=bool(interpret), hbm_groups=hbm_groups)
    if time_segment is not None:
        seg_blocks = max(1, -(-time_segment // unroll))
        if seg_blocks >= n_blocks:
            time_segment = None                      # one segment: inline
    if time_segment is not None:
        n_seg = -(-n_steps // (seg_blocks * unroll))
        n_blocks = n_seg * seg_blocks
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    seb = _pad_rows(incs, t_pad)                     # per-example rows
    se = jnp.repeat(seb, r_pad, axis=1)              # rank-expanded lanes

    # LOCAL initial rows: locally unit-normalized + absolute log-scale
    # (the global W normalization cancels in e — it is scale-invariant —
    # so per-group bookkeeping only needs each group's own scale)
    wr, wi = params.Wx, params.Wy
    if r_pad > r_loc:
        # lane padding: zero factor rows (auto_pad_rank_partials) — zero
        # through the linear update, no contribution to the e/tr partial
        # sums, tr0 (hence gamma) unchanged
        wr = jnp.pad(wr, ((0, r_pad - r_loc), (0, 0)))
        wi = jnp.pad(wi, ((0, r_pad - r_loc), (0, 0)))
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    h0r = jnp.tile(wr.T * inv0, (1, B))
    h0i = jnp.tile(wi.T * inv0, (1, B))
    zmat = jnp.repeat(jnp.eye(B, dtype=jnp.float32), r_pad, axis=0)
    c0 = jnp.log(jnp.maximum(tr0, cfg.norm_eps))

    ab, bb, xb = _rho_block_constants(cc)
    t0 = _rho_block_t0(cc, h0r, h0i)
    if stream is None:
        from .pallas_block import auto_stream
        # per-kernel-call steps; with segmentation only ONE segment's
        # stream is live during the backward (jax.checkpoint), so sibling
        # groups don't stack either
        if time_segment is None:
            seg_steps, groups = t_pad, max(1, hbm_groups)
        else:
            seg_steps, groups = seg_blocks * unroll, 1
        stream = auto_stream(cfg, BR, (seg_steps + 1) * groups, True,
                             bool(interpret))
    if stream and not interpret and BR % 128 != 0:
        raise ValueError(
            f"streamed rank-partials kernels need B*r_loc % 128 == 0 on "
            f"TPU (static lane slices of the state stream must be "
            f"tile-aligned), got B*r_loc={BR}")
    if time_segment is None:
        fused = _rank_partials_factory(cfg, B, t_pad + 1, r_pad, unroll,
                                       bool(interpret), precision,
                                       bool(stream))
        eh, trr, _ = fused(ab, bb, xb, t0, se, zmat, zmat.T)
    else:
        L = seg_blocks * unroll
        fused = _rank_partials_factory(cfg, B, L + 1, r_pad, unroll,
                                       bool(interpret), precision,
                                       bool(stream))
        zt = zmat.T

        def seg_fn(t_in, se_seg):
            eh_s, tr_s, t_out = fused(ab, bb, xb, t_in, se_seg, zmat, zt)
            return t_out, (eh_s, tr_s)

        _, (ehs, trs) = jax.lax.scan(jax.checkpoint(seg_fn), t0,
                                     se.reshape(n_seg, L, BR))
        eh = ehs.reshape(t_pad, B)
        trr = trs.reshape(t_pad, B)

    K = unroll
    tr3 = trr.reshape(n_blocks, K, B)
    trp = jnp.concatenate(
        [jnp.ones((n_blocks, 1, B), trr.dtype), tr3[:, :K - 1]], axis=1)
    blk = jnp.log(jnp.maximum(tr3[:, K - 1], cfg.norm_eps))  # [nb, B]
    offs = jnp.concatenate(
        [jnp.zeros((1, B), blk.dtype), jnp.cumsum(blk, axis=0)[:-1]],
        axis=0)
    gam = c0 + jnp.broadcast_to(offs[:, None, :], (n_blocks, K, B))

    sl = slice(0, n_steps)
    return (eh[sl], trp.reshape(t_pad, B)[sl],
            gam.reshape(t_pad, B)[sl], seb[sl])


def combine_rank_partials(eh, trp, gam, seb, cfg: CMPSConfig):
    """Global mean NLL from stacked group partials.

    eh/trp/gam: [G, T-1, B] (stacked rank groups — chips or chunks);
    seb: [T-1, B]. Log-domain combination: each group's partials are
    rescaled to a common per-step shift m = max_g gamma, summed, and the
    expectation e = num/den is exactly the globally-normalized value."""
    m = jnp.max(gam, axis=0)                          # [T-1, B]
    w = jnp.exp(gam - m[None])
    num = jnp.sum(eh * w, axis=0)
    den = jnp.sum(trp * w, axis=0)
    e = num / jnp.maximum(den, cfg.norm_eps)
    arg = 1.0 + e * seb
    if cfg.log_eps > 0:
        arg = jnp.maximum(arg, cfg.log_eps)
    return jnp.mean(jnp.sum(-jnp.log(arg), axis=0))


def rho_nll_rank_chunked(params, cfg: CMPSConfig, signals, *,
                         rank_chunk: Optional[int] = None,
                         unroll: Optional[int] = None,
                         interpret: Optional[bool] = None,
                         precision: str = "highest",
                         time_segment: Optional[int] = None,
                         stream: Optional[bool] = None):
    """Single-device fused rho NLL BEYOND the single-kernel VMEM ceiling:
    split the purification rank into chunks, run the partials kernel per
    chunk (row-independence makes each exact), combine outside. Lifts the
    measured D-ceiling (full-rank D=256 = e.g. 4 chunks of 64 rows) at
    the cost of per-chunk kernel dispatches; zero communication.

    `rank_chunk=None` auto-picks the largest VMEM-fitting divisor."""
    rank = params.Wx.shape[0]
    B = signals.shape[0]
    if rank_chunk is None:
        rank_chunk = rank_chunk_for(cfg, B, rank)
        if rank_chunk is None:
            raise ValueError(
                f"no rank chunk fits VMEM at bond_dim={cfg.bond_dim}, "
                f"B={B} — shrink minibatch_size or bond_dim")
    if rank % rank_chunk:
        raise ValueError(f"rank {rank} must be divisible by "
                         f"rank_chunk {rank_chunk}")
    n_chunks = rank // rank_chunk
    parts = []
    for c in range(n_chunks):
        rows = slice(c * rank_chunk, (c + 1) * rank_chunk)
        p_loc = params.replace(Wx=params.Wx[rows], Wy=params.Wy[rows])
        parts.append(rho_nll_rank_partials(
            p_loc, cfg, signals, unroll=unroll, interpret=interpret,
            precision=precision, time_segment=time_segment,
            stream=stream, hbm_groups=n_chunks))
    eh = jnp.stack([p[0] for p in parts])
    trp = jnp.stack([p[1] for p in parts])
    gam = jnp.stack([p[2] for p in parts])
    seb = parts[0][3]
    return combine_rank_partials(eh, trp, gam, seb, cfg)


# ===========================================================================
# Temporal-pipeline composition pieces — a fused chunk step with a CARRIED
# state (t_in -> partials + t_out), so the time axis can be sharded over a
# mesh with the hot loop still fused (parallel/time_pipeline.py consumes
# these; VERDICT r3 item 1's "time-sharding rides the XLA chunked scan").
# ===========================================================================

def rank_partials_chunk_unroll(cfg: CMPSConfig, B: int, r_pad: int,
                               chunk_steps: int,
                               unroll: Optional[int] = None) -> int:
    """Unroll for a carried-state chunk: it must DIVIDE chunk_steps
    exactly — in-kernel tail padding would evolve the carried state
    through dummy zero-signal steps (zero signal is NOT the identity:
    the deterministic C pass and the block renormalization still apply),
    contaminating t_fin for the next stage. The pick is the LARGEST
    DIVISOR of chunk_steps <= the auto/explicit unroll — NOT
    gcd(unroll, chunk_steps), which collapses to 1 whenever the auto
    pick is coprime with the chunk (measured 3.5x: auto=5 vs 2^14 steps
    gave unroll=1 and 347 ms where the monolithic kernel runs 99).
    (Pure helper: `rank_partials_chunk_factory` separately REJECTS an
    explicit non-divisor unroll rather than silently adjusting it.)"""
    u = max(1, int(partials_unroll(cfg.bond_dim, B * r_pad, unroll)))
    cs = int(chunk_steps)
    return next(d for d in range(min(u, cs), 0, -1) if cs % d == 0)


def rank_partials_chunk_ops(cc, cfg: CMPSConfig, B: int, r_pad: int):
    """Data-independent kernel operands (ab, bb, xb, zmat, zt) for
    `rank_partials_chunk_factory`'s chunk_fn — split out of
    `rank_partials_chunk_operands` so callers with PER-EXAMPLE initial
    states (the latent family's pipelined recon) can pair them with their
    own `rank_partials_chunk_t0` stacks."""
    zmat = jnp.repeat(jnp.eye(B, dtype=jnp.float32), r_pad, axis=0)
    ab, bb, xb = _rho_block_constants(cc)
    return (ab, bb, xb, zmat, zmat.T)


def rank_partials_chunk_t0(cc, wr, wi, cfg: CMPSConfig, r_pad: int,
                           B: int = None):
    """Kernel-frame initial state [2D, B*r_pad] from (possibly
    unnormalized) local factor rows, locally unit-normalized (the
    absolute scale cancels in e = eh/trp — single-group combine). Zero
    pad rows are exact (auto_pad_rank_partials's rationale).

    wr/wi [r_loc, D]: rows SHARED across the batch (B required), tiled
    per example and normalized by the global trace (= the trace of rho0,
    identical for every example). wr/wi [B, r_loc, D]: PER-EXAMPLE rows
    (e.g. the latent family's decoded psi_0 as a rank-1 purification,
    models/latent.py decode_psi0), each example normalized by its own
    trace — the identity map for already-normalized psi_0 (and the
    normalize-VJP's tangential projection is idempotent, so gradients
    through an upstream normalize are unchanged)."""
    if wr.ndim == 2:
        r_loc = wr.shape[0]
        if r_pad > r_loc:
            wr = jnp.pad(wr, ((0, r_pad - r_loc), (0, 0)))
            wi = jnp.pad(wi, ((0, r_pad - r_loc), (0, 0)))
        tr0 = jnp.sum(wr * wr + wi * wi)
        inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
        h0r = jnp.tile(wr.T * inv0, (1, B))
        h0i = jnp.tile(wi.T * inv0, (1, B))
    else:
        b, r_loc, d = wr.shape
        if r_pad > r_loc:
            wr = jnp.pad(wr, ((0, 0), (0, r_pad - r_loc), (0, 0)))
            wi = jnp.pad(wi, ((0, 0), (0, r_pad - r_loc), (0, 0)))
        tr0 = jnp.sum(wr * wr + wi * wi, axis=(1, 2))
        inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
        h0r = (wr * inv0[:, None, None]).reshape(b * r_pad, d).T
        h0i = (wi * inv0[:, None, None]).reshape(b * r_pad, d).T
    return _rho_block_t0(cc, h0r, h0i)


def rank_partials_chunk_operands(cc, wr, wi, cfg: CMPSConfig, B: int,
                                 r_pad: int):
    """Kernel operands + kernel-frame initial state from shared local
    factor rows wr/wi [r_loc, D]: (ops, t0) with ops = (ab, bb, xb, zmat,
    zt) for `rank_partials_chunk_factory`'s chunk_fn and t0 =
    [2D, B*r_pad] (see `rank_partials_chunk_t0`)."""
    return (rank_partials_chunk_ops(cc, cfg, B, r_pad),
            rank_partials_chunk_t0(cc, wr, wi, cfg, r_pad, B))


def rank_partials_chunk_factory(cfg: CMPSConfig, B: int, chunk_steps: int,
                                r_loc: int, *,
                                unroll: Optional[int] = None,
                                interpret: Optional[bool] = None,
                                precision: str = "highest",
                                stream: bool = False):
    """Fused chunk step with a carried state, for temporal pipelining.

    Returns (chunk_fn, r_pad, unroll) where
    ``chunk_fn(ops, t_in, seb_chunk [chunk_steps, B]) ->
    (t_out, (eh, tr))`` with ops from `rank_partials_chunk_operands`.
    t_in/t_out are in the kernel frame ([2D, B*r_pad]); chaining them
    across chunk calls is exact (the kernel renormalizes at every block
    exit, and chunk_steps is a whole number of unroll blocks — enforced
    by `rank_partials_chunk_unroll`). Grads flow through t_in AND t_out
    (the custom VJP's dtfin seeds the adjoint recurrence)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"rank-partials kernels use the block layout "
            f"(bond_dim % 4 == 0), got bond_dim={cfg.bond_dim}")
    r_pad = auto_pad_rank_partials(cfg, B, r_loc, bool(interpret))
    if unroll is not None and chunk_steps % unroll:
        # an EXPLICIT unroll is honored or rejected, like the other
        # kernel knobs (stream/precision) — silently swapping in a
        # divisor would make an A/B harness measure a different unroll
        # than requested; unroll=None auto-picks the largest divisor
        raise ValueError(
            f"explicit unroll {unroll} must divide chunk_steps "
            f"{chunk_steps} (carried-state chunks cannot tail-pad); "
            f"leave unroll=None for the auto divisor pick")
    u = rank_partials_chunk_unroll(cfg, B, r_pad, chunk_steps, unroll)
    BR = B * r_pad
    if stream and not interpret and BR % 128 != 0:
        raise ValueError(
            f"streamed rank-partials kernels need B*r_loc % 128 == 0 on "
            f"TPU (static lane slices of the state stream must be "
            f"tile-aligned), got B*r_loc={BR}")
    fused = _rank_partials_factory(cfg, B, chunk_steps + 1, r_pad, u,
                                   bool(interpret), precision, bool(stream))

    def chunk_fn(ops, t_in, seb_chunk):
        ab, bb, xb, zmat, zt = ops
        se = jnp.repeat(seb_chunk, r_pad, axis=1)
        eh, tr, t_out = fused(ab, bb, xb, t_in, se, zmat, zt)
        return t_out, (eh, tr)

    return chunk_fn, r_pad, u


def rank_partials_chunk_nll(eh, tr, seb, unroll: int, cfg: CMPSConfig):
    """Per-example NLL sum over one chunk from its LOCAL partial rows —
    the single-group (full local rank) specialization of
    `combine_rank_partials`: with one group the rescaling weights cancel
    and e = eh / trp exactly, so no gamma bookkeeping (and no cross-chunk
    state) is needed. eh/tr: [L, B] kernel outputs; seb: [L, B]."""
    L, B = eh.shape
    nb = L // unroll
    tr3 = tr.reshape(nb, unroll, B)
    trp = jnp.concatenate(
        [jnp.ones((nb, 1, B), tr.dtype), tr3[:, :unroll - 1]],
        axis=1).reshape(L, B)
    e = eh / jnp.maximum(trp, cfg.norm_eps)
    arg = 1.0 + e * seb
    if cfg.log_eps > 0:
        arg = jnp.maximum(arg, cfg.log_eps)
    return jnp.sum(-jnp.log(arg), axis=0)
