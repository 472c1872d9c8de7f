"""Pallas TPU fused-scan kernels for the cMPS hot loop.

Why: the XLA `lax.scan` path pays ~1 us/iteration of loop overhead plus an
HBM round-trip for every op in the cell body (measured on v5e; see bench.py)
— 65,536 sequential steps at 4-9 us each. These kernels run the entire time
loop inside one `pallas_call`: the ancilla state and all scan constants stay
resident in VMEM scratch (the TPU grid is sequential, so scratch carries
state across grid iterations), signal increments stream in K-row blocks,
and only the per-batch NLL / waveform rows leave the chip.

Design (see SURVEY.md §7):
  - Everything is split real/imag fp32 (no complex dtype on this backend).
  - HORIZONTAL layout: examples live on lanes. psi state is [D, B]
    columns; every matrix application is a shared left-GEMM (D,D)@(D,B..)
    — wide-N MXU shapes.
  - rho is evolved as its PURIFICATION FACTOR G with rho = G^dag G — the
    exact form of the reference's initial state rho_0 = W^dag W / tr
    (reference model.py:118-130). The Kraus update rho'' = U rho U^dag
    factorizes exactly as G'' = G U^dag; on the stored H = G^T that is
    H <- conj(U) H, a one-sided shared left-GEMM (a two-sided update on
    rho itself cannot be expressed with shared-side GEMMs — the
    per-example scalar s sits on both sides). Trace = ||G||_F^2,
    expectation tr(X rho'') = sum Re(G'' . conj(G'' X)), and the frame
    rotation rho -> P^dag rho P is a row scale of H.
  - NO dynamic indexing and NO in-kernel loops: Mosaic forbids dynamic
    lane indexing, and dynamic sublane reads inside fori_loop deadlocked
    this backend. Instead the grid walks T_pad/K blocks and the K steps
    inside a block are statically unrolled with literal row slices.
  - Per-block scalars (signal s, trace, expectation) live as [1, B*rank]
    rows (lane-aligned); per-example reductions/broadcasts over the rank
    lane-groups are two skinny matmuls with a 0/1 segment matrix.

The per-step semantics are bit-for-bit the rotating-frame cell
(models/cell.py), which tests pin to the reference lab-frame evolution
(reference: model.py:152-203, 276-334).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CMPSConfig
from ..models import core
from ..models.cell import make_constants

# Shared by every FORWARD-ONLY pallas_call in this module (SDE samplers
# and forward-only NLL): raised scoped-VMEM ceiling matching the
# trainable kernels' 100 MiB. At the default 16 MiB large D*cols configs
# die in a clean scoped-VMEM OOM (measured r4: the full-rank rho D=256
# N=4 sampler needs 31.7 MiB and runs cleanly once raised).
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024)

# Steps per grid iteration (statically unrolled in the kernel body).
DEFAULT_UNROLL = 16


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _full(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))


def _pad_rows(x, t_pad):
    out = jnp.zeros((t_pad,) + x.shape[1:], x.dtype)
    return out.at[: x.shape[0]].set(x)


def rho_factor_inputs(params, cfg: CMPSConfig, n_cols: int,
                      rank_pad: Optional[int] = None):
    """Normalized initial purification factor H0 tiled over n_cols examples
    + the 0/1 segment matrix — the ONE home for the W-normalization
    semantics, shared by every rho kernel entry point (split and block,
    trainable/sampler/forward-only).

    ``rank_pad``: pad the purification rank with ZERO factor rows (lane
    auto-padding, ops/pallas_block.auto_pad_rank). Zero rows stay exactly
    zero under the linear factor update, so they contribute nothing to
    any trace/expectation segment sum — values and gradients are exact
    (the pad's VJP drops the dummy-row cotangents)."""
    wr, wi = params.Wx, params.Wy
    if rank_pad is not None and rank_pad > wr.shape[0]:
        wr = jnp.pad(wr, ((0, rank_pad - wr.shape[0]), (0, 0)))
        wi = jnp.pad(wi, ((0, rank_pad - wi.shape[0]), (0, 0)))
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    h0r = jnp.tile(wr.T * inv0, (1, n_cols))
    h0i = jnp.tile(wi.T * inv0, (1, n_cols))
    zmat = jnp.repeat(jnp.eye(n_cols, dtype=jnp.float32), wr.shape[0],
                      axis=0)
    return h0r, h0i, zmat


# ===========================================================================
# psi forward NLL kernel
# ===========================================================================

def _make_psi_nll_kernel(cfg: CMPSConfig, unroll: int, total: int,
                         precision: str, defer_norm: bool = False):
    """defer_norm: keep the state unnormalized within a block and divide the
    per-step expectation by the previous step's squared norm instead
    (e_t = ehat_t / n2hat_{t-1} — exactly the normalized-state value, since
    the update is linear and the rotation unitary); normalize once at block
    exit. Removes the normalize+rsqrt from the per-step state dependency
    chain."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref,               # [K, B] signal/A rows for this block
               s0r_ref, s0i_ref,     # [D, B] initial psi columns
               cr_ref, ci_ref,       # [D, D] C
               rr_ref, ri_ref,       # [D, D] R
               pc_ref, ps_ref,       # [D, 1] rotation cos/sin(f dt)
               loss_ref,             # out row [1, B] of the [n_blocks, B]
                                     # streamed accumulator (the final row
                                     # is the answer; revisited output
                                     # windows deadlock this backend's
                                     # Mosaic, so the output streams)
               pr_s, pi_s, acc_s):   # scratch [D,B] x2, [1,B]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            pr_s[:] = s0r_ref[:]
            pi_s[:] = s0i_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        cr, ci = cr_ref[:], ci_ref[:]
        rr, ri = rr_ref[:], ri_ref[:]
        pc = pc_ref[:]
        ps = ps_ref[:]

        pr, pi_ = pr_s[:], pi_s[:]
        acc = acc_s[:]
        if defer_norm:
            n2_prev = jnp.ones_like(acc)
            for k in range(unroll):
                s = se_ref[k:k + 1, :]
                g1r = _dot(cr, pr, precision) - _dot(ci, pi_, precision)
                g1i = _dot(cr, pi_, precision) + _dot(ci, pr, precision)
                g2r = _dot(rr, pr, precision) - _dot(ri, pi_, precision)
                g2i = _dot(rr, pi_, precision) + _dot(ri, pr, precision)
                yr = g1r + s * g2r
                yi = g1i + s * g2i
                # loss path (off the state dependency chain)
                rur = _dot(rr, yr, precision) - _dot(ri, yi, precision)
                rui = _dot(rr, yi, precision) + _dot(ri, yr, precision)
                ehat = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0,
                                     keepdims=True)
                n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
                e = ehat / jnp.maximum(n2_prev, norm_eps)
                arg = jnp.maximum(1.0 + e * s, log_eps)
                live = (i * unroll + k) < total
                acc = jnp.where(live, acc - jnp.log(arg), acc)
                # state path: rotate only
                nr = yr * pc + yi * ps
                ni = yi * pc - yr * ps
                pr = jnp.where(live, nr, pr)
                pi_ = jnp.where(live, ni, pi_)
                n2_prev = jnp.where(live, n2, n2_prev)
            # block-exit renormalization
            inv = jax.lax.rsqrt(jnp.maximum(n2_prev, norm_eps))
            pr = pr * inv
            pi_ = pi_ * inv
        else:
            for k in range(unroll):                   # static unroll
                s = se_ref[k:k + 1, :]                # [1, B] static row
                # psi'' = C psi + s R psi (shared left-GEMMs on columns)
                g1r = _dot(cr, pr, precision) - _dot(ci, pi_, precision)
                g1i = _dot(cr, pi_, precision) + _dot(ci, pr, precision)
                g2r = _dot(rr, pr, precision) - _dot(ri, pi_, precision)
                g2i = _dot(rr, pi_, precision) + _dot(ri, pr, precision)
                yr = g1r + s * g2r
                yi = g1i + s * g2i
                # e = 2 Re <psi''| R |psi''>
                rur = _dot(rr, yr, precision) - _dot(ri, yi, precision)
                rui = _dot(rr, yi, precision) + _dot(ri, yr, precision)
                e = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0, keepdims=True)
                arg = jnp.maximum(1.0 + e * s, log_eps)
                # normalize then rotate by conj(p)
                n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
                inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
                yr = yr * inv
                yi = yi * inv
                live = (i * unroll + k) < total       # padding gate
                acc = jnp.where(live, acc - jnp.log(arg), acc)
                nr = yr * pc + yi * ps
                ni = yi * pc - yr * ps
                pr = jnp.where(live, nr, pr)
                pi_ = jnp.where(live, ni, pi_)

        pr_s[:] = pr
        pi_s[:] = pi_
        acc_s[:] = acc
        loss_ref[0] = acc

    return kernel


def _nll_layout(cfg: CMPSConfig, layout: Optional[str]) -> str:
    """Forward-NLL layout resolution — ONE policy with the trainable
    kernels: delegate to pallas_grad.resolve_layout ("auto" falls back to
    split when bond_dim % 4 != 0; an explicit unsupported 'block' flows
    into the block kernel, which raises)."""
    from .pallas_grad import resolve_layout
    return resolve_layout(cfg, layout)


def psi_nll_pallas(params, cfg: CMPSConfig, signals, *,
                   unroll: int = DEFAULT_UNROLL,
                   interpret: Optional[bool] = None,
                   precision: str = "highest",
                   defer_norm: bool = False,
                   layout: Optional[str] = None):
    """Mean NLL [scalar] of waveforms [B, T] under the pure-state model —
    fused Pallas forward (semantics of core.psi_nll / reference
    model.py:257-267)."""
    if _nll_layout(cfg, layout) == "block":
        from .pallas_block import psi_nll_block
        return psi_nll_block(params, cfg, signals, unroll=unroll,
                             interpret=interpret, precision=precision,
                             defer_norm=defer_norm)
    if precision == "high":
        raise ValueError(
            "kernel_precision='high' (bf16x3) is only implemented in the "
            "block kernel layout (ops/pallas_block.py)")
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A        # [T-1, B]
    se = _pad_rows(incs, t_pad)

    pr0, pi0 = core.psi0(params, cfg)
    s0r = jnp.broadcast_to(pr0[:, None], (D, B))
    s0i = jnp.broadcast_to(pi0[:, None], (D, B))

    kernel = _make_psi_nll_kernel(cfg, unroll, n_steps, precision,
                                  defer_norm=defer_norm)

    loss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, B), lambda i: (i, 0)),
            _full((D, B)), _full((D, B)),
            _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
            _full((D, 1)), _full((D, 1)),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, B), jnp.float32),
            pltpu.VMEM((D, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(se, s0r, s0i, cc.Cr, cc.Ci, cc.Rr, cc.Ri,
      cc.p_c[:, None], cc.p_s[:, None])
    return jnp.mean(loss[-1, 0])


# ===========================================================================
# rho forward NLL kernel (purification factor H = G^T, [D, B*rank])
# ===========================================================================

def _make_rho_nll_kernel(cfg: CMPSConfig, unroll: int, total: int, rank: int,
                         precision: str, defer_norm: bool = False):
    """defer_norm: as in the psi kernel — unnormalized factor within a
    block, e_t = ehat_t / trhat_{t-1}, per-example scalars kept in [1, B]
    space (segment sums only, no broadcasts back), one renormalization per
    block. Exact up to fp rounding; pinned by tests."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref,                 # [K, BR] signal/A rows
               h0r_ref, h0i_ref,       # [D, BR] initial factor columns
               ccr_ref, cci_ref,       # [D, D] conj(C)
               rcr_ref, rci_ref,       # [D, D] conj(R)
               xtr_ref, xti_ref,       # [D, D] X^T
               pc_ref, ps_ref,         # [D, 1] rotation
               z_ref, zt_ref,          # [BR, B], [B, BR] segment matrices
               loss_ref,               # out row [1, B] (streamed; see psi)
               hr_s, hi_s, acc_s):     # scratch
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            hr_s[:] = h0r_ref[:]
            hi_s[:] = h0i_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ccr, cci = ccr_ref[:], cci_ref[:]
        rcr, rci = rcr_ref[:], rci_ref[:]
        xtr, xti = xtr_ref[:], xti_ref[:]
        pc = pc_ref[:]
        ps = ps_ref[:]
        z = z_ref[:]
        zt = zt_ref[:]

        def seg_broadcast(row):
            """[1,BR] partials -> per-example sums broadcast to [1,BR]."""
            return _dot(_dot(row, z, precision), zt, precision)

        hr, hi = hr_s[:], hi_s[:]
        acc = acc_s[:]
        if defer_norm:
            # accumulate loss directly per example [1, B]; state stays
            # unnormalized inside the block
            acc_b = _dot(acc, z, precision) * (1.0 / rank)
            tr_prev = jnp.ones_like(acc_b)
            for k in range(unroll):
                s = se_ref[k:k + 1, :]
                a1r = _dot(ccr, hr, precision) - _dot(cci, hi, precision)
                a1i = _dot(ccr, hi, precision) + _dot(cci, hr, precision)
                a2r = _dot(rcr, hr, precision) - _dot(rci, hi, precision)
                a2i = _dot(rcr, hi, precision) + _dot(rci, hr, precision)
                yr = a1r + s * a2r
                yi = a1i + s * a2i
                # loss path, [1, B] space
                gxr = _dot(xtr, yr, precision) - _dot(xti, yi, precision)
                gxi = _dot(xtr, yi, precision) + _dot(xti, yr, precision)
                ehat = _dot(jnp.sum(yr * gxr + yi * gxi, axis=0,
                                    keepdims=True), z, precision)
                trhat = _dot(jnp.sum(yr * yr + yi * yi, axis=0,
                                     keepdims=True), z, precision)
                s_b = _dot(s, z, precision) * (1.0 / rank)
                e = ehat / jnp.maximum(tr_prev, norm_eps)
                arg = jnp.maximum(1.0 + e * s_b, log_eps)
                live = (i * unroll + k) < total
                acc_b = jnp.where(live, acc_b - jnp.log(arg), acc_b)
                tr_prev = jnp.where(live, trhat, tr_prev)
                # state path: rotate only
                nr = yr * pc - yi * ps
                ni = yr * ps + yi * pc
                hr = jnp.where(live, nr, hr)
                hi = jnp.where(live, ni, hi)
            # block-exit renormalization (one broadcast back to lanes)
            inv_b = jax.lax.rsqrt(jnp.maximum(tr_prev, norm_eps))
            inv_lanes = _dot(inv_b, zt, precision)
            hr = hr * inv_lanes
            hi = hi * inv_lanes
            hr_s[:] = hr
            hi_s[:] = hi
            # keep per-lane acc consistent for the streamed output
            acc = _dot(acc_b, zt, precision)
            acc_s[:] = acc
            loss_ref[0] = acc_b
            return
        for k in range(unroll):                       # static unroll
            s = se_ref[k:k + 1, :]                    # [1, BR] static row
            # --- G'' = G U^dag  <=>  H'' = conj(U) H
            a1r = _dot(ccr, hr, precision) - _dot(cci, hi, precision)
            a1i = _dot(ccr, hi, precision) + _dot(cci, hr, precision)
            a2r = _dot(rcr, hr, precision) - _dot(rci, hi, precision)
            a2i = _dot(rcr, hi, precision) + _dot(rci, hr, precision)
            yr = a1r + s * a2r
            yi = a1i + s * a2i
            # --- e = Re tr(X rho'') = sum Re(H'' . conj(X^T H''))
            gxr = _dot(xtr, yr, precision) - _dot(xti, yi, precision)
            gxi = _dot(xtr, yi, precision) + _dot(xti, yr, precision)
            e_bc = seg_broadcast(
                jnp.sum(yr * gxr + yi * gxi, axis=0, keepdims=True))
            arg = jnp.maximum(1.0 + e_bc * s, log_eps)
            # --- normalize: tr(rho'') = ||G''||_F^2 per example
            tr_bc = seg_broadcast(
                jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True))
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
            yr = yr * inv
            yi = yi * inv
            live = (i * unroll + k) < total
            acc = jnp.where(live, acc - jnp.log(arg), acc)
            # --- rotate: G <- G P  <=>  H <- P H (row scale)
            nr = yr * pc - yi * ps
            ni = yr * ps + yi * pc
            hr = jnp.where(live, nr, hr)
            hi = jnp.where(live, ni, hi)

        hr_s[:] = hr
        hi_s[:] = hi
        acc_s[:] = acc
        # lanes within an example's rank-group are identical; average out
        loss_ref[0] = _dot(acc, z, precision) * (1.0 / rank)

    return kernel


def rho_nll_pallas(params, cfg: CMPSConfig, signals, *,
                   unroll: int = DEFAULT_UNROLL,
                   interpret: Optional[bool] = None,
                   precision: str = "highest",
                   defer_norm: bool = False,
                   layout: Optional[str] = None):
    """Mean NLL of waveforms [B, T] under the mixed-state model — fused
    Pallas forward in purification-factor form (semantics of core.rho_nll /
    reference model.py:132-142)."""
    if _nll_layout(cfg, layout) == "block":
        from .pallas_block import rho_nll_block
        return rho_nll_block(params, cfg, signals, unroll=unroll,
                             interpret=interpret, precision=precision,
                             defer_norm=defer_norm)
    if precision == "high":
        raise ValueError(
            "kernel_precision='high' (bf16x3) is only implemented in the "
            "block kernel layout (ops/pallas_block.py)")
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    BR = B * rank
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A        # [T-1, B]
    se = jnp.repeat(_pad_rows(incs, t_pad), rank, axis=1)     # [T_pad, BR]

    h0r, h0i, zmat = rho_factor_inputs(params, cfg, B)

    kernel = _make_rho_nll_kernel(cfg, unroll, n_steps, rank, precision,
                                  defer_norm=defer_norm)

    loss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, BR), lambda i: (i, 0)),
            _full((D, BR)), _full((D, BR)),
            _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
            _full((D, D)), _full((D, D)),
            _full((D, 1)), _full((D, 1)),
            _full((BR, B)), _full((B, BR)),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, BR), jnp.float32),
            pltpu.VMEM((D, BR), jnp.float32),
            pltpu.VMEM((1, BR), jnp.float32),
        ],
        interpret=interpret,
    )(se, h0r, h0i,
      cc.Cr, -cc.Ci,                # conj(C)
      cc.Rr, -cc.Ri,                # conj(R)
      cc.Xr.T, cc.Xi.T,             # X^T ((G X)^T = X^T H)
      cc.p_c[:, None], cc.p_s[:, None],
      zmat, zmat.T)
    return jnp.mean(loss[-1, 0])


# ===========================================================================
# Sampler kernels (Euler–Maruyama SDE, reference: model.py:103-112, 242-251)
# ===========================================================================
# Generation is irreducibly serial (each step conditions on the realized
# increment, reference model.py:160-167), so per-step latency dominates:
# the whole SDE runs in one kernel, noise streams in, waveform rows stream
# out. Padded tail steps run harmlessly past T and are sliced off outside.

def _make_psi_sample_kernel(cfg: CMPSConfig, unroll: int, precision: str):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps

    def kernel(nz_ref,               # [K, N] noise rows
               s0r_ref, s0i_ref,     # [D, N]
               cr_ref, ci_ref, rr_ref, ri_ref,
               pc_ref, ps_ref,       # [D, 1]
               ia_ref,               # [1, 1] 1/A (traced param)
               wav_ref,              # out [K, N] waveform rows
               pr_s, pi_s, samp_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            pr_s[:] = s0r_ref[:]
            pi_s[:] = s0i_ref[:]
            samp_s[:] = jnp.zeros_like(samp_s)

        cr, ci = cr_ref[:], ci_ref[:]
        rr, ri = rr_ref[:], ri_ref[:]
        pc = pc_ref[:]
        ps = ps_ref[:]
        ia = ia_ref[0, 0]

        pr, pi_ = pr_s[:], pi_s[:]
        samp = samp_s[:]
        for k in range(unroll):
            # e on the CURRENT state (reference model.py:284-287)
            rur = _dot(rr, pr, precision) - _dot(ri, pi_, precision)
            rui = _dot(rr, pi_, precision) + _dot(ri, pr, precision)
            e = 2.0 * jnp.sum(pr * rur + pi_ * rui, axis=0, keepdims=True)
            inc = e * dt + nz_ref[k:k + 1, :]
            samp = samp + inc
            wav_ref[k:k + 1, :] = samp
            # conditioned update psi'' = C psi + (inc/A) R psi; R psi is
            # reused from the expectation (identical value; the reference
            # recomputes it, model.py:288)
            s = inc * ia
            yr = _dot(cr, pr, precision) - _dot(ci, pi_, precision) + s * rur
            yi = _dot(cr, pi_, precision) + _dot(ci, pr, precision) + s * rui
            n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
            yr = yr * inv
            yi = yi * inv
            pr = yr * pc + yi * ps
            pi_ = yi * pc - yr * ps

        pr_s[:] = pr
        pi_s[:] = pi_
        samp_s[:] = samp

    return kernel


def _sampler_layout(cfg: CMPSConfig, layout: Optional[str]) -> str:
    """Sampler layout resolution: the block-complex samplers
    (ops/pallas_block.py) need D % 8 == 0 — a stricter bound than the
    trainable block kernels' D % 4 == 0 — so even an explicit "block"
    falls back to the split samplers when unsupported (a model trained
    with kernel_layout="block" at e.g. D=12 must still sample). An
    explicit downgrade warns once so benchmarks aren't silently timing
    the split kernels."""
    requested = layout if layout is not None else cfg.kernel_layout
    if requested not in ("auto", "split", "block"):
        raise ValueError(
            f"layout must be 'auto', 'split', or 'block', got {requested!r}")
    if requested in ("auto", "block"):
        from .pallas_block import supports_block_sampler
        if supports_block_sampler(cfg):
            return "block"
        if requested == "block":
            import warnings
            warnings.warn(
                f"explicit sampler layout='block' needs bond_dim % 8 == 0; "
                f"falling back to the split sampler at D={cfg.bond_dim}",
                stacklevel=3)
        return "split"
    return requested


def _warn_high_downgrade(cfg: CMPSConfig):
    """A valid block-TRAINING config (D % 4 == 0, precision='high') whose
    sampler fell back to split runs full fp32 instead of bf16x3 — strictly
    more accurate, but worth a visible signal when benchmarking."""
    import warnings
    warnings.warn(
        f"sampler precision='high' (bf16x3) exists only in the block "
        f"kernels; split fallback at D={cfg.bond_dim} runs full fp32 "
        f"('highest') instead", stacklevel=3)


def psi_sample_pallas(params, cfg: CMPSConfig, noise, *,
                      unroll: int = DEFAULT_UNROLL,
                      interpret: Optional[bool] = None,
                      precision: Optional[str] = None,
                      layout: Optional[str] = None,
                      psi0_pair=None):
    """Waveforms [N, T] from noise [T, N] — fused SDE sampler (semantics of
    core.sample_psi_with_noise / reference model.py:242-251).

    ``precision=None`` follows ``cfg.kernel_precision`` — a model trained
    in the bf16x3 "high" mode samples in it too (at MXU-bound D the fused
    sampler's win over the XLA scan IS the precision mode: D=256 N=8
    measured 0.75x at 6-pass fp32 but 1.48x at bf16x3, r4).

    ``psi0_pair``: optional PER-EXAMPLE initial states ([N, D] real/imag
    pair) — used by the latent-conditioned family, whose decoder emits one
    psi_0 per sample (models/latent.py)."""
    if precision is None:
        precision = cfg.kernel_precision
    if _sampler_layout(cfg, layout) == "block":
        from .pallas_block import psi_sample_block
        return psi_sample_block(params, cfg, noise, unroll=unroll,
                                interpret=interpret, precision=precision,
                                psi0_pair=psi0_pair)
    if precision == "high":
        # bf16x3 exists only in the block kernels; when the sampler falls
        # back to split (D % 8 != 0 — a valid block-TRAINING config must
        # still sample), run full fp32 instead: strictly more accurate
        _warn_high_downgrade(cfg)
        precision = "highest"
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    n_blocks = max(1, -(-T // unroll))
    t_pad = n_blocks * unroll
    nz = _pad_rows(noise, t_pad)

    if psi0_pair is not None:
        s0r, s0i = psi0_pair[0].T, psi0_pair[1].T        # [D, N]
    else:
        pr0, pi0 = core.psi0(params, cfg)
        s0r = jnp.broadcast_to(pr0[:, None], (D, N))
        s0i = jnp.broadcast_to(pi0[:, None], (D, N))

    kernel = _make_psi_sample_kernel(cfg, unroll, precision)

    wave = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, N), lambda i: (i, 0)),
            _full((D, N)), _full((D, N)),
            _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
            _full((D, 1)), _full((D, 1)),
            _full((1, 1)),
        ],
        out_specs=pl.BlockSpec((unroll, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((D, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        interpret=interpret,
    )(nz, s0r, s0i, cc.Cr, cc.Ci, cc.Rr, cc.Ri,
      cc.p_c[:, None], cc.p_s[:, None], (1.0 / cc.A).reshape(1, 1))
    return cc.A * wave[:T].T


def psi_sample_pallas_keyed(params, cfg: CMPSConfig, key, num_samples: int,
                            length: int, temp=1.0, **kw):
    """Drop-in for core.sample_psi using the fused kernel."""
    std = cfg.sigma * jnp.sqrt(jnp.asarray(temp) * cfg.delta_t)
    noise = std * jax.random.normal(key, (length, num_samples), jnp.float32)
    return psi_sample_pallas(params, cfg, noise, **kw)


def _make_rho_sample_kernel(cfg: CMPSConfig, unroll: int, rank: int,
                            precision: str):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps

    def kernel(nz_ref,                 # [K, NR] expanded noise rows
               h0r_ref, h0i_ref,       # [D, NR]
               ccr_ref, cci_ref, rcr_ref, rci_ref,
               xtr_ref, xti_ref,
               pc_ref, ps_ref,
               z_ref, zt_ref,
               ia_ref,
               wav_ref,                # out [K, NR]
               hr_s, hi_s, samp_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            hr_s[:] = h0r_ref[:]
            hi_s[:] = h0i_ref[:]
            samp_s[:] = jnp.zeros_like(samp_s)

        ccr, cci = ccr_ref[:], cci_ref[:]
        rcr, rci = rcr_ref[:], rci_ref[:]
        xtr, xti = xtr_ref[:], xti_ref[:]
        pc = pc_ref[:]
        ps = ps_ref[:]
        z = z_ref[:]
        zt = zt_ref[:]
        ia = ia_ref[0, 0]

        def seg_broadcast(row):
            return _dot(_dot(row, z, precision), zt, precision)

        hr, hi = hr_s[:], hi_s[:]
        samp = samp_s[:]
        for k in range(unroll):
            # e on the CURRENT state (reference model.py:160-167)
            gxr = _dot(xtr, hr, precision) - _dot(xti, hi, precision)
            gxi = _dot(xtr, hi, precision) + _dot(xti, hr, precision)
            e_bc = seg_broadcast(
                jnp.sum(hr * gxr + hi * gxi, axis=0, keepdims=True))
            inc = e_bc * dt + nz_ref[k:k + 1, :]
            samp = samp + inc
            wav_ref[k:k + 1, :] = samp
            s = inc * ia
            a1r = _dot(ccr, hr, precision) - _dot(cci, hi, precision)
            a1i = _dot(ccr, hi, precision) + _dot(cci, hr, precision)
            a2r = _dot(rcr, hr, precision) - _dot(rci, hi, precision)
            a2i = _dot(rcr, hi, precision) + _dot(rci, hr, precision)
            yr = a1r + s * a2r
            yi = a1i + s * a2i
            tr_bc = seg_broadcast(
                jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True))
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
            yr = yr * inv
            yi = yi * inv
            hr = yr * pc - yi * ps
            hi = yr * ps + yi * pc

        hr_s[:] = hr
        hi_s[:] = hi
        samp_s[:] = samp

    return kernel


def rho_sample_pallas(params, cfg: CMPSConfig, noise, *,
                      unroll: int = DEFAULT_UNROLL,
                      interpret: Optional[bool] = None,
                      precision: Optional[str] = None,
                      layout: Optional[str] = None):
    """Waveforms [N, T] from noise [T, N] — fused SDE sampler in
    purification-factor form (semantics of core.sample_rho_with_noise /
    reference model.py:103-112). ``precision=None`` follows
    ``cfg.kernel_precision`` (see psi_sample_pallas)."""
    if precision is None:
        precision = cfg.kernel_precision
    if _sampler_layout(cfg, layout) == "block":
        from .pallas_block import rho_sample_block
        return rho_sample_block(params, cfg, noise, unroll=unroll,
                                interpret=interpret, precision=precision)
    if precision == "high":
        # see psi_sample_pallas: split fallback runs fp32 instead of
        # raising on valid block-training configs
        _warn_high_downgrade(cfg)
        precision = "highest"
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    NR = N * rank
    n_blocks = max(1, -(-T // unroll))
    t_pad = n_blocks * unroll
    nz = jnp.repeat(_pad_rows(noise, t_pad), rank, axis=1)

    h0r, h0i, zmat = rho_factor_inputs(params, cfg, N)

    kernel = _make_rho_sample_kernel(cfg, unroll, rank, precision)

    wave = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, NR), lambda i: (i, 0)),
            _full((D, NR)), _full((D, NR)),
            _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
            _full((D, D)), _full((D, D)),
            _full((D, 1)), _full((D, 1)),
            _full((NR, N)), _full((N, NR)),
            _full((1, 1)),
        ],
        out_specs=pl.BlockSpec((unroll, NR), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, NR), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, NR), jnp.float32),
            pltpu.VMEM((D, NR), jnp.float32),
            pltpu.VMEM((1, NR), jnp.float32),
        ],
        interpret=interpret,
    )(nz, h0r, h0i,
      cc.Cr, -cc.Ci, cc.Rr, -cc.Ri,
      cc.Xr.T, cc.Xi.T,
      cc.p_c[:, None], cc.p_s[:, None],
      zmat, zmat.T, (1.0 / cc.A).reshape(1, 1))
    return cc.A * wave[:T, ::rank].T


def rho_sample_pallas_keyed(params, cfg: CMPSConfig, key, num_samples: int,
                            length: int, temp=1.0, **kw):
    """Drop-in for core.sample_rho using the fused kernel."""
    std = cfg.sigma * jnp.sqrt(jnp.asarray(temp) * cfg.delta_t)
    noise = std * jax.random.normal(key, (length, num_samples), jnp.float32)
    return rho_sample_pallas(params, cfg, noise, **kw)
