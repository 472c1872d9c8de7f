"""Pallas TPU fused-scan kernels for the cMPS hot loop.

Why: the XLA `lax.scan` path pays ~1 us/iteration of loop overhead plus an
HBM round-trip for every op in the cell body (measured on v5e; see bench.py)
— 65,536 sequential steps at 4-9 us each. These kernels run the entire time
loop inside one `pallas_call`: the ancilla state and all scan constants stay
resident in VMEM, increments stream in chunk-by-chunk via the grid (the TPU
grid is sequential, so VMEM scratch carries state across chunks), and only
the per-batch NLL and final state leave the chip.

Design (see SURVEY.md §7):
  - Everything is split real/imag fp32 (no complex dtype on this backend).
  - psi state is a row-stack [B, D]; every matrix application is a shared
    right-multiply by a transposed constant: (M psi)_row = psi_row @ M^T.
    The reference's first-order update (model.py:300-317) is exactly
    psi'' = U psi with U = C + s R, C = I - (sigma^2 dt/2) R^dag R.
  - rho is evolved as its PURIFICATION FACTOR G with rho = G^dag G — the
    exact form of the reference's initial state rho_0 = W^dag W / tr
    (model.py:118-130). The Kraus update rho'' = U rho U^dag factorizes
    exactly as G'' = G U^dag, a one-sided shared right-GEMM on the
    vertically stacked factor [B*rank, D] (a two-sided update on rho
    itself cannot be expressed with shared-side GEMMs at all — the
    per-example scalar s sits on both sides). Trace = ||G||_F^2,
    expectation tr(X rho'') = sum conj(G'') . (G'' X^T), the frame
    rotation rho -> P^dag rho P is a diagonal column scale of G.
  - Per-block scalars (signal s_b, trace, expectation) live as sublane
    columns: increments are pre-expanded host-side to [B*rank, T_pad] so a
    lane slice yields an aligned column, and per-block reductions /
    broadcasts are two skinny matmuls with a 0/1 segment matrix.

Semantics are bit-for-bit the rotating-frame cell (models/cell.py), which
tests pin to the reference lab-frame evolution (model.py:152-203, 276-334).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CMPSConfig
from ..models import core
from ..models.cell import make_constants

DEFAULT_CHUNK = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


# ===========================================================================
# Layout note
# ===========================================================================
# Mosaic only supports *dynamic* indexing on the sublane (second-minor)
# dimension, so per-step scalars are read as rows of a time-major signal
# array se[T_pad, B*rank], and the state is kept in a HORIZONTAL layout:
# columns are examples, matrices apply from the LEFT as (D,D)@(D,B*rank)
# GEMMs (wide N = great MXU utilization). The factor update G <- G U^dag
# becomes H <- conj(U) H on H = G^T; the frame rotation is a row scale.


# ===========================================================================
# psi forward NLL kernel (state [D, B], columns = examples)
# ===========================================================================

def _psi_nll_kernel(total_ref,            # scalar prefetch: [1] int32
                    se_ref,               # [CHUNK, B] signal/A rows
                    s0r_ref, s0i_ref,     # [D, B] initial psi columns
                    cr_ref, ci_ref,       # [D, D] C
                    rr_ref, ri_ref,       # [D, D] R
                    pc_ref, ps_ref,       # [D, 1] rotation cos/sin(f dt)
                    loss_ref,             # out [1, B]
                    fr_ref, fi_ref,       # out [D, B] final state
                    pr_s, pi_s, acc_s,    # scratch [D,B] x2, [1,B]
                    *, chunk, log_eps, norm_eps, precision):
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
    total = total_ref[0]

    def step(t, _):
        pr, pi_ = pr_s[:], pi_s[:]
        s = se_ref[pl.ds(t, 1), :]                    # [1, B] row
        # psi'' = C psi + s R psi   (columns; shared left-GEMMs)
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
        # normalize then rotate by conj(p) (rows scaled by p_d)
        n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
        yr = yr * inv
        yi = yi * inv

        @pl.when(i * chunk + t < total)
        def _commit():
            acc_s[:] = acc_s[:] - jnp.log(arg)
            pr_s[:] = yr * pc + yi * ps
            pi_s[:] = yi * pc - yr * ps

        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    loss_ref[:] = acc_s[:]
    fr_ref[:] = pr_s[:]
    fi_ref[:] = pi_s[:]


def psi_nll_pallas(params, cfg: CMPSConfig, signals, *,
                   chunk: int = DEFAULT_CHUNK,
                   interpret: Optional[bool] = None,
                   precision: str = "highest"):
    """Mean NLL [scalar] of waveforms [B, T] under the pure-state model —
    fused Pallas forward (semantics of core.psi_nll / reference
    model.py:257-267)."""
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    n_steps = T - 1
    n_chunks = max(1, -(-n_steps // chunk))
    t_pad = n_chunks * chunk

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A        # [T-1, B]
    se = jnp.zeros((t_pad, B), jnp.float32).at[:n_steps].set(incs)

    pr0, pi0 = core.psi0(params, cfg)
    s0r = jnp.broadcast_to(pr0[:, None], (D, B))
    s0i = jnp.broadcast_to(pi0[:, None], (D, B))

    kernel = functools.partial(
        _psi_nll_kernel, chunk=chunk, log_eps=max(cfg.log_eps, 1e-30),
        norm_eps=cfg.norm_eps, precision=precision)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, B), lambda i, *_: (i, 0)),
            full((D, B)), full((D, B)),
            full((D, D)), full((D, D)), full((D, D)), full((D, D)),
            full((D, 1)), full((D, 1)),
        ],
        out_specs=[
            full((1, B)), full((D, B)), full((D, B)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B), jnp.float32),
            pltpu.VMEM((D, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
    )

    loss, _fr, _fi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
            jax.ShapeDtypeStruct((D, B), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([n_steps], jnp.int32), se, s0r, s0i,
      cc.Cr, cc.Ci, cc.Rr, cc.Ri,
      cc.p_c[:, None], cc.p_s[:, None])
    return jnp.mean(loss)


# ===========================================================================
# rho forward NLL kernel (purification factor, H = G^T, [D, B*rank])
# ===========================================================================

def _rho_nll_kernel(total_ref,              # scalar prefetch
                    se_ref,                 # [CHUNK, BR] signal/A rows
                    h0r_ref, h0i_ref,       # [D, BR] initial factor columns
                    ccr_ref, cci_ref,       # [D, D] conj(C)
                    rcr_ref, rci_ref,       # [D, D] conj(R)
                    xtr_ref, xti_ref,       # [D, D] X^T
                    pc_ref, ps_ref,         # [D, 1] rotation cos/sin(f dt)
                    z_ref,                  # [BR, B] segment matrix
                    zt_ref,                 # [B, BR] its transpose
                    loss_ref,               # out [1, B]
                    fr_ref, fi_ref,         # out [D, BR] final factor
                    hr_s, hi_s, acc_s,      # scratch
                    *, chunk, rank, log_eps, norm_eps, precision):
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
    total = total_ref[0]

    def seg_broadcast(row):
        """[1,BR] partials -> per-block sums broadcast back to [1,BR]."""
        return _dot(_dot(row, z, precision), zt, precision)

    def step(t, _):
        hr, hi = hr_s[:], hi_s[:]
        s = se_ref[pl.ds(t, 1), :]                    # [1, BR] row
        # --- G'' = G U^dag  <=>  H'' = conj(U) H = (conj(C) + s conj(R)) H
        a1r = _dot(ccr, hr, precision) - _dot(cci, hi, precision)
        a1i = _dot(ccr, hi, precision) + _dot(cci, hr, precision)
        a2r = _dot(rcr, hr, precision) - _dot(rci, hi, precision)
        a2i = _dot(rcr, hi, precision) + _dot(rci, hr, precision)
        yr = a1r + s * a2r
        yi = a1i + s * a2i
        # --- e_b = Re tr(X rho'') = sum Re(H'' . conj(X^T H'')) per block
        gxr = _dot(xtr, yr, precision) - _dot(xti, yi, precision)
        gxi = _dot(xtr, yi, precision) + _dot(xti, yr, precision)
        e_part = jnp.sum(yr * gxr + yi * gxi, axis=0, keepdims=True)
        e_bc = seg_broadcast(e_part)
        arg = jnp.maximum(1.0 + e_bc * s, log_eps)
        # --- normalize: tr(rho'') = ||G''||_F^2 per block
        tr_part = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
        tr_bc = seg_broadcast(tr_part)
        inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
        yr = yr * inv
        yi = yi * inv

        @pl.when(i * chunk + t < total)
        def _commit():
            acc_s[:] = acc_s[:] - jnp.log(arg)
            # --- rotate: G <- G P  <=>  H <- P H (row scale by p_d)
            hr_s[:] = yr * pc - yi * ps
            hi_s[:] = yr * ps + yi * pc

        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    # lanes of a block are identical in acc; block-sum then divide by rank
    loss_ref[:] = _dot(acc_s[:], z, precision) * (1.0 / rank)
    fr_ref[:] = hr_s[:]
    fi_ref[:] = hi_s[:]


def rho_nll_pallas(params, cfg: CMPSConfig, signals, *,
                   chunk: int = DEFAULT_CHUNK,
                   interpret: Optional[bool] = None,
                   precision: str = "highest"):
    """Mean NLL of waveforms [B, T] under the mixed-state model — fused
    Pallas forward in purification-factor form (semantics of core.rho_nll /
    reference model.py:132-142)."""
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    BR = B * rank
    n_steps = T - 1
    n_chunks = max(1, -(-n_steps // chunk))
    t_pad = n_chunks * chunk

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A        # [T-1, B]
    se = jnp.zeros((t_pad, B), jnp.float32).at[:n_steps].set(incs)
    se = jnp.repeat(se, rank, axis=1)                         # [T_pad, BR]

    # H0 = G0^T, G0 = W / sqrt(tr(W^dag W)) (reference model.py:118-130)
    wr, wi = params.Wx, params.Wy
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    h0r = jnp.tile(wr.T * inv0, (1, B))
    h0i = jnp.tile(wi.T * inv0, (1, B))

    zmat = jnp.repeat(jnp.eye(B, dtype=jnp.float32), rank, axis=0)  # [BR, B]

    kernel = functools.partial(
        _rho_nll_kernel, chunk=chunk, rank=rank,
        log_eps=max(cfg.log_eps, 1e-30), norm_eps=cfg.norm_eps,
        precision=precision)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, BR), lambda i, *_: (i, 0)),
            full((D, BR)), full((D, BR)),
            full((D, D)), full((D, D)), full((D, D)), full((D, D)),
            full((D, D)), full((D, D)),
            full((D, 1)), full((D, 1)),
            full((BR, B)), full((B, BR)),
        ],
        out_specs=[
            full((1, B)), full((D, BR)), full((D, BR)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, BR), jnp.float32),
            pltpu.VMEM((D, BR), jnp.float32),
            pltpu.VMEM((1, BR), jnp.float32),
        ],
    )

    loss, _fr, _fi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((D, BR), jnp.float32),
            jax.ShapeDtypeStruct((D, BR), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([n_steps], jnp.int32), se, h0r, h0i,
      cc.Cr, -cc.Ci,                # conj(C)
      cc.Rr, -cc.Ri,                # conj(R)
      cc.Xr.T, cc.Xi.T,             # X^T (e identity needs X^T on H)
      cc.p_c[:, None], cc.p_s[:, None],
      zmat, zmat.T)
    return jnp.mean(loss)


# ===========================================================================
# Sampler kernels (Euler–Maruyama SDE, reference: model.py:103-112, 242-251)
# ===========================================================================
# Generation is irreducibly serial (each step conditions on the realized
# increment, reference model.py:160-167), so per-step latency dominates:
# the whole SDE runs in one kernel, noise streams in time-major, waveform
# rows stream out. No masking: padded tail steps are computed and sliced
# off outside (their state never escapes).

def _psi_sample_kernel_factory(cfg, chunk, precision):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps

    def kernel(nz_ref,               # [CHUNK, N] noise rows
               s0r_ref, s0i_ref,     # [D, N] initial psi columns
               cr_ref, ci_ref,       # [D, D] C
               rr_ref, ri_ref,       # [D, D] R
               pc_ref, ps_ref,       # [D, 1] rotation
               ia_ref,               # [1, 1] 1/A (traced param)
               wav_ref,              # out [CHUNK, N] waveform rows
               pr_s, pi_s, samp_s):  # scratch [D,N] x2, [1,N]
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

        def step(t, _):
            pr, pi_ = pr_s[:], pi_s[:]
            # e = 2 Re <psi|R|psi> on the CURRENT state (reference
            # model.py:284-287: expectation precedes the conditioned update)
            rur = _dot(rr, pr, precision) - _dot(ri, pi_, precision)
            rui = _dot(rr, pi_, precision) + _dot(ri, pr, precision)
            e = 2.0 * jnp.sum(pr * rur + pi_ * rui, axis=0, keepdims=True)
            inc = e * dt + nz_ref[pl.ds(t, 1), :]
            samp_s[:] = samp_s[:] + inc
            wav_ref[pl.ds(t, 1), :] = samp_s[:]
            # conditioned update psi'' = C psi + (inc/A) R psi; R psi is
            # reused from the expectation (the reference recomputes it —
            # identical value, model.py:288)
            s = inc * ia
            yr = _dot(cr, pr, precision) - _dot(ci, pi_, precision) + s * rur
            yi = _dot(cr, pi_, precision) + _dot(ci, pr, precision) + s * rui
            n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
            yr = yr * inv
            yi = yi * inv
            pr_s[:] = yr * pc + yi * ps
            pi_s[:] = yi * pc - yr * ps
            return 0

        jax.lax.fori_loop(0, chunk, step, 0)

    return kernel


def psi_sample_pallas(params, cfg: CMPSConfig, noise, *,
                      chunk: int = DEFAULT_CHUNK,
                      interpret: Optional[bool] = None,
                      precision: str = "highest"):
    """Waveforms [N, T] from noise [T, N] — fused SDE sampler (semantics of
    core.sample_psi_with_noise / reference model.py:242-251)."""
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    n_chunks = max(1, -(-T // chunk))
    t_pad = n_chunks * chunk
    nz = jnp.zeros((t_pad, N), jnp.float32).at[:T].set(noise)

    pr0, pi0 = core.psi0(params, cfg)
    s0r = jnp.broadcast_to(pr0[:, None], (D, N))
    s0i = jnp.broadcast_to(pi0[:, None], (D, N))

    kernel = _psi_sample_kernel_factory(cfg, chunk, precision)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    wave = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, N), lambda i: (i, 0)),
            full((D, N)), full((D, N)),
            full((D, D)), full((D, D)), full((D, D)), full((D, D)),
            full((D, 1)), full((D, 1)),
            full((1, 1)),
        ],
        out_specs=pl.BlockSpec((chunk, N), lambda i: (i, 0)),
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


def _rho_sample_kernel_factory(cfg, chunk, rank, precision):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps

    def kernel(nz_ref,                 # [CHUNK, NR] expanded noise rows
               h0r_ref, h0i_ref,       # [D, NR] initial factor
               ccr_ref, cci_ref,       # [D, D] conj(C)
               rcr_ref, rci_ref,       # [D, D] conj(R)
               xtr_ref, xti_ref,       # [D, D] X^T
               pc_ref, ps_ref,         # [D, 1]
               z_ref, zt_ref,          # segment matrices
               ia_ref,                 # [1, 1] 1/A
               wav_ref,                # out [CHUNK, NR]
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

        def step(t, _):
            hr, hi = hr_s[:], hi_s[:]
            # e on the CURRENT state (reference model.py:160-167)
            gxr = _dot(xtr, hr, precision) - _dot(xti, hi, precision)
            gxi = _dot(xtr, hi, precision) + _dot(xti, hr, precision)
            e_part = jnp.sum(hr * gxr + hi * gxi, axis=0, keepdims=True)
            e_bc = seg_broadcast(e_part)
            inc = e_bc * dt + nz_ref[pl.ds(t, 1), :]
            samp_s[:] = samp_s[:] + inc
            wav_ref[pl.ds(t, 1), :] = samp_s[:]
            s = inc * ia
            # factor update H <- conj(U) H
            a1r = _dot(ccr, hr, precision) - _dot(cci, hi, precision)
            a1i = _dot(ccr, hi, precision) + _dot(cci, hr, precision)
            a2r = _dot(rcr, hr, precision) - _dot(rci, hi, precision)
            a2i = _dot(rcr, hi, precision) + _dot(rci, hr, precision)
            yr = a1r + s * a2r
            yi = a1i + s * a2i
            tr_part = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
            tr_bc = seg_broadcast(tr_part)
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
            yr = yr * inv
            yi = yi * inv
            hr_s[:] = yr * pc - yi * ps
            hi_s[:] = yr * ps + yi * pc
            return 0

        jax.lax.fori_loop(0, chunk, step, 0)

    return kernel


def rho_sample_pallas(params, cfg: CMPSConfig, noise, *,
                      chunk: int = DEFAULT_CHUNK,
                      interpret: Optional[bool] = None,
                      precision: str = "highest"):
    """Waveforms [N, T] from noise [T, N] — fused SDE sampler in
    purification-factor form (semantics of core.sample_rho_with_noise /
    reference model.py:103-112)."""
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    NR = N * rank
    n_chunks = max(1, -(-T // chunk))
    t_pad = n_chunks * chunk
    nz = jnp.zeros((t_pad, N), jnp.float32).at[:T].set(noise)
    nz = jnp.repeat(nz, rank, axis=1)

    wr, wi = params.Wx, params.Wy
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    h0r = jnp.tile(wr.T * inv0, (1, N))
    h0i = jnp.tile(wi.T * inv0, (1, N))
    zmat = jnp.repeat(jnp.eye(N, dtype=jnp.float32), rank, axis=0)

    kernel = _rho_sample_kernel_factory(cfg, chunk, rank, precision)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    wave = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, NR), lambda i: (i, 0)),
            full((D, NR)), full((D, NR)),
            full((D, D)), full((D, D)), full((D, D)), full((D, D)),
            full((D, D)), full((D, D)),
            full((D, 1)), full((D, 1)),
            full((NR, N)), full((N, NR)),
            full((1, 1)),
        ],
        out_specs=pl.BlockSpec((chunk, NR), lambda i: (i, 0)),
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
