"""Fused Pallas forward+backward for cMPS training (custom VJP).

Training is the headline metric (BASELINE.json: frames/sec/chip at D=64
*training*), and the XLA BPTT path pays the scan-loop overhead twice per
step. Here the entire forward NLL *and* the entire reverse sweep each run
as one Pallas kernel:

  - forward kernel = the fused NLL scan (ops/pallas_scan.py semantics),
    additionally streaming the block-entry ancilla state as checkpoints
    [n_blocks, D, B];
  - backward kernel walks the grid in REVERSE, re-runs the K unrolled
    steps of each block from its checkpoint (store-K-states remat, the
    standard two-level checkpoint scheme), and applies the hand-derived
    adjoint of every step, accumulating parameter cotangents (dC, dR,
    d rotation) in VMEM scratch and streaming the per-step signal
    cotangent d(se) back out (which carries the gradient of A).

The custom_vjp boundary sits at the *derived constants* (C, R, p, psi0,
se): everything from the learnable parameters to those constants is plain
differentiable JAX, so parameter plumbing (R's zero-diagonal gauge, the
rotating-frame constants, A's appearance inside se = incs/A) is handled by
autodiff, while the 2x65536-step hot loops are hand-written kernels.

Gradient correctness is pinned against jax.grad of the XLA scan
(tests/test_pallas_grad.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CMPSConfig
from ..models import core
from ..models.cell import make_constants

from .pallas_scan import (DEFAULT_UNROLL, _full, _on_tpu,  # noqa: F401
                          _pad_rows, rho_factor_inputs)


def _dot(a, b, precision="highest"):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


# ===========================================================================
# psi forward (with checkpoints) + backward kernels
# ===========================================================================

def _psi_fwd_step(cr, ci, rr, ri, pc, ps, pr, pi_, s, log_eps, norm_eps,
                  precision="highest"):
    """One forward step; returns everything the adjoint needs."""
    _d = functools.partial(_dot, precision=precision)
    g2r = _d(rr, pr) - _d(ri, pi_)              # R psi
    g2i = _d(rr, pi_) + _d(ri, pr)
    g1r = _d(cr, pr) - _d(ci, pi_)              # C psi
    g1i = _d(cr, pi_) + _d(ci, pr)
    yr = g1r + s * g2r
    yi = g1i + s * g2i
    rur = _d(rr, yr) - _d(ri, yi)               # R psi''
    rui = _d(rr, yi) + _d(ri, yr)
    e = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0, keepdims=True)
    arg = jnp.maximum(1.0 + e * s, log_eps)
    n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
    tyr = yr * inv
    tyi = yi * inv
    npr = tyr * pc + tyi * ps                   # rotate by conj(p)
    npi = tyi * pc - tyr * ps
    return dict(g2r=g2r, g2i=g2i, yr=yr, yi=yi, rur=rur, rui=rui, e=e,
                arg=arg, n2=n2, inv=inv, tyr=tyr, tyi=tyi, npr=npr, npi=npi)


def _psi_fwd_step_defer(cr, ci, rr, ri, pc, ps, pr, pi_, n2p, s,
                        log_eps, norm_eps, precision="highest"):
    """One forward step, DEFERRED normalization: the state stays
    unnormalized within a block (the update is linear, the rotation
    unitary), the expectation divides by the previous step's squared norm
    instead (e = ehat / n2_prev — exactly the normalized-state value), and
    renormalization happens once at block exit. Removes the per-step
    rsqrt + 2 [D,B] scalings from the forward state-dependency chain and
    the per-step normalize adjoint from the backward."""
    _d = functools.partial(_dot, precision=precision)
    g2r = _d(rr, pr) - _d(ri, pi_)              # R psi
    g2i = _d(rr, pi_) + _d(ri, pr)
    g1r = _d(cr, pr) - _d(ci, pi_)              # C psi
    g1i = _d(cr, pi_) + _d(ci, pr)
    yr = g1r + s * g2r
    yi = g1i + s * g2i
    rur = _d(rr, yr) - _d(ri, yi)               # R psi''
    rui = _d(rr, yi) + _d(ri, yr)
    ehat = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0, keepdims=True)
    n2p_c = jnp.maximum(n2p, norm_eps)
    e = ehat / n2p_c
    arg = jnp.maximum(1.0 + e * s, log_eps)
    n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
    npr = yr * pc + yi * ps                     # rotate by conj(p), no norm
    npi = yi * pc - yr * ps
    return dict(g2r=g2r, g2i=g2i, yr=yr, yi=yi, rur=rur, rui=rui,
                ehat=ehat, e=e, arg=arg, n2=n2, npr=npr, npi=npi)


def _make_psi_fwd_kernel(cfg: CMPSConfig, unroll: int, total: int,
                         precision: str = "highest",
                         defer_norm: bool = False):
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref,               # [1, K, B] signal rows
               s0r_ref, s0i_ref, cr_ref, ci_ref, rr_ref, ri_ref,
               pc_ref, ps_ref,
               loss_ref, ckr_ref, cki_ref,
               pr_s, pi_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            pr_s[:] = s0r_ref[:]
            pi_s[:] = s0i_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        cr, ci = cr_ref[:], ci_ref[:]
        rr, ri = rr_ref[:], ri_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]

        pr, pi_ = pr_s[:], pi_s[:]
        # checkpoint = block-entry state (always normalized: blocks exit
        # normalized in both modes)
        ckr_ref[0] = pr
        cki_ref[0] = pi_
        acc = acc_s[:]
        if defer_norm:
            n2_prev = jnp.ones_like(acc)
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _psi_fwd_step_defer(cr, ci, rr, ri, pc, ps, pr, pi_,
                                        n2_prev, s, log_eps, norm_eps,
                                        precision)
                live = (i * unroll + k) < total
                acc = jnp.where(live, acc - jnp.log(f["arg"]), acc)
                pr = jnp.where(live, f["npr"], pr)
                pi_ = jnp.where(live, f["npi"], pi_)
                n2_prev = jnp.where(live, f["n2"], n2_prev)
            # block-exit renormalization (rotation is unitary, so the
            # last step's n2 is the current squared norm)
            inv = jax.lax.rsqrt(jnp.maximum(n2_prev, norm_eps))
            pr = pr * inv
            pi_ = pi_ * inv
        else:
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _psi_fwd_step(cr, ci, rr, ri, pc, ps, pr, pi_, s,
                                  log_eps, norm_eps, precision)
                live = (i * unroll + k) < total
                acc = jnp.where(live, acc - jnp.log(f["arg"]), acc)
                pr = jnp.where(live, f["npr"], pr)
                pi_ = jnp.where(live, f["npi"], pi_)

        pr_s[:] = pr
        pi_s[:] = pi_
        acc_s[:] = acc
        loss_ref[0] = acc

    return kernel


def _make_psi_bwd_kernel(cfg: CMPSConfig, unroll: int, total: int,
                         n_blocks: int, precision: str = "highest"):
    """The backward takes the PER-EXAMPLE loss cotangent g [1, B] as a
    runtime input (g = grad/B for the batch-mean loss; arbitrary per-example
    weights for e.g. importance-weighted ELBOs), so parameter cotangents
    accumulate lane-weighted inside the kernel."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref, g_ref, ckr_ref, cki_ref, cr_ref, ci_ref, rr_ref,
               ri_ref, pc_ref, ps_ref,
               dse_ref, dcr_ref, dci_ref, drr_ref, dri_ref,
               dpc_ref, dps_ref, dp0r_ref, dp0i_ref,
               dpr_s, dpi_s, acr_s, aci_s, arr_s, ari_s, apc_s, aps_s):
        i = pl.program_id(0)          # reversed block: real block = nb-1-i
        blk = n_blocks - 1 - i

        @pl.when(i == 0)
        def _init():
            dpr_s[:] = jnp.zeros_like(dpr_s)
            dpi_s[:] = jnp.zeros_like(dpi_s)
            acr_s[:] = jnp.zeros_like(acr_s)
            aci_s[:] = jnp.zeros_like(aci_s)
            arr_s[:] = jnp.zeros_like(arr_s)
            ari_s[:] = jnp.zeros_like(ari_s)
            apc_s[:] = jnp.zeros_like(apc_s)
            aps_s[:] = jnp.zeros_like(aps_s)

        cr, ci = cr_ref[:], ci_ref[:]
        rr, ri = rr_ref[:], ri_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]

        # --- recompute the block forward from its checkpoint, retaining
        # the per-step entry states and GEMM products (the scalar tail —
        # e/arg/n2 — is cheap to recompute in the reverse sweep, but the
        # matmuls are not)
        pr = ckr_ref[0]
        pi_ = cki_ref[0]
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _psi_fwd_step(cr, ci, rr, ri, pc, ps, pr, pi_, s,
                              log_eps, norm_eps, precision)
            saved.append((pr, pi_, f["g2r"], f["g2i"], f["yr"], f["yi"],
                          f["rur"], f["rui"]))
            live = (blk * unroll + k) < total
            pr = jnp.where(live, f["npr"], pr)
            pi_ = jnp.where(live, f["npi"], pi_)

        _d = functools.partial(_dot, precision=precision)
        # --- reverse sweep
        dpr, dpi = dpr_s[:], dpi_s[:]
        dacr, daci = acr_s[:], aci_s[:]
        darr, dari = arr_s[:], ari_s[:]
        dapc, daps = apc_s[:], aps_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            pr0, pi0, g2r, g2i, yr, yi, rur, rui = saved[k]
            # cheap scalar tail recompute (VPU only)
            e = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0, keepdims=True)
            arg = jnp.maximum(1.0 + e * s, log_eps)
            n2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
            tyr = yr * inv
            tyi = yi * inv

            # rotate adjoint: np = (tyr*pc+tyi*ps, tyi*pc-tyr*ps)
            dtyr = dpr * pc - dpi * ps
            dtyi = dpr * ps + dpi * pc
            g_dpc = jnp.sum(dpr * tyr + dpi * tyi, axis=1, keepdims=True)
            g_dps = jnp.sum(dpr * tyi - dpi * tyr, axis=1, keepdims=True)
            # normalize adjoint: ty = y * inv, inv = rsqrt(max(n2, eps))
            dyr = dtyr * inv
            dyi = dtyi * inv
            dinv = jnp.sum(dtyr * yr + dtyi * yi, axis=0, keepdims=True)
            dn2 = jnp.where(n2 > norm_eps,
                            -0.5 * dinv * inv * inv * inv,
                            jnp.zeros_like(dinv))
            dyr = dyr + 2.0 * yr * dn2
            dyi = dyi + 2.0 * yi * dn2
            # loss adjoint: acc -= log(arg); arg = max(1 + e*s, eps);
            # per-lane weighted by the loss cotangent g
            darg = jnp.where(arg > log_eps,
                             -g_ref[:] / arg, jnp.zeros_like(arg))
            de = darg * s
            ds = darg * e
            # e = 2 sum(y . ru)
            dyr = dyr + 2.0 * de * rur
            dyi = dyi + 2.0 * de * rui
            drur = 2.0 * de * yr
            drui = 2.0 * de * yi
            # ru = R y adjoint (also accumulates dR)
            dyr = dyr + _d(rr.T, drur) + _d(ri.T, drui)
            dyi = dyi - _d(ri.T, drur) + _d(rr.T, drui)
            g_drr = _d(drur, yr.T) + _d(drui, yi.T)
            g_dri = _d(drui, yr.T) - _d(drur, yi.T)
            # y = g1 + s*g2
            dg1r, dg1i = dyr, dyi
            dg2r = s * dyr
            dg2i = s * dyi
            ds = ds + jnp.sum(dyr * g2r + dyi * g2i, axis=0, keepdims=True)
            # g1 = C p adjoint
            dprn = _d(cr.T, dg1r) + _d(ci.T, dg1i)
            dpin = -_d(ci.T, dg1r) + _d(cr.T, dg1i)
            g_dcr = _d(dg1r, pr0.T) + _d(dg1i, pi0.T)
            g_dci = _d(dg1i, pr0.T) - _d(dg1r, pi0.T)
            # g2 = R p adjoint
            dprn = dprn + _d(rr.T, dg2r) + _d(ri.T, dg2i)
            dpin = dpin - _d(ri.T, dg2r) + _d(rr.T, dg2i)
            g_drr = g_drr + _d(dg2r, pr0.T) + _d(dg2i, pi0.T)
            g_dri = g_dri + _d(dg2i, pr0.T) - _d(dg2r, pi0.T)

            live = (blk * unroll + k) < total
            dse_ref[0, k:k + 1, :] = jnp.where(live, ds,
                                               jnp.zeros_like(ds))
            dpr = jnp.where(live, dprn, dpr)
            dpi = jnp.where(live, dpin, dpi)
            dacr = jnp.where(live, dacr + g_dcr, dacr)
            daci = jnp.where(live, daci + g_dci, daci)
            darr = jnp.where(live, darr + g_drr, darr)
            dari = jnp.where(live, dari + g_dri, dari)
            dapc = jnp.where(live, dapc + g_dpc, dapc)
            daps = jnp.where(live, daps + g_dps, daps)

        dpr_s[:] = dpr
        dpi_s[:] = dpi
        acr_s[:] = dacr
        aci_s[:] = daci
        arr_s[:] = darr
        ari_s[:] = dari
        apc_s[:] = dapc
        aps_s[:] = daps

        @pl.when(i == n_blocks - 1)
        def _emit():
            dcr_ref[:] = acr_s[:]
            dci_ref[:] = aci_s[:]
            drr_ref[:] = arr_s[:]
            dri_ref[:] = ari_s[:]
            dpc_ref[:] = apc_s[:]
            dps_ref[:] = aps_s[:]
            dp0r_ref[:] = dpr_s[:]
            dp0i_ref[:] = dpi_s[:]

    return kernel


def _make_psi_bwd_kernel_defer(cfg: CMPSConfig, unroll: int, total: int,
                               n_blocks: int, precision: str = "highest"):
    """Deferred-normalization adjoint: the block recompute runs the
    unnormalized chain from the (normalized) block-entry checkpoint; the
    block-exit renormalization adjoint seeds (dp, dn2); the reversed sweep
    carries the squared-norm cotangent dn2 alongside dp and has NO
    per-step normalize adjoint (the per-step rsqrt chain is gone — the
    expectation division e = ehat/n2_prev is the only norm coupling)."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref, g_ref, ckr_ref, cki_ref, cr_ref, ci_ref, rr_ref,
               ri_ref, pc_ref, ps_ref,
               dse_ref, dcr_ref, dci_ref, drr_ref, dri_ref,
               dpc_ref, dps_ref, dp0r_ref, dp0i_ref,
               dpr_s, dpi_s, acr_s, aci_s, arr_s, ari_s, apc_s, aps_s):
        i = pl.program_id(0)          # reversed block: real block = nb-1-i
        blk = n_blocks - 1 - i

        @pl.when(i == 0)
        def _init():
            dpr_s[:] = jnp.zeros_like(dpr_s)
            dpi_s[:] = jnp.zeros_like(dpi_s)
            acr_s[:] = jnp.zeros_like(acr_s)
            aci_s[:] = jnp.zeros_like(aci_s)
            arr_s[:] = jnp.zeros_like(arr_s)
            ari_s[:] = jnp.zeros_like(ari_s)
            apc_s[:] = jnp.zeros_like(apc_s)
            aps_s[:] = jnp.zeros_like(aps_s)

        cr, ci = cr_ref[:], ci_ref[:]
        rr, ri = rr_ref[:], ri_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]

        # --- recompute the unnormalized block chain from the checkpoint
        pr = ckr_ref[0]
        pi_ = cki_ref[0]
        n2_prev = jnp.ones_like(se_ref[0, 0:1, :])
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _psi_fwd_step_defer(cr, ci, rr, ri, pc, ps, pr, pi_,
                                    n2_prev, s, log_eps, norm_eps,
                                    precision)
            saved.append((pr, pi_, n2_prev, f["g2r"], f["g2i"],
                          f["yr"], f["yi"], f["rur"], f["rui"]))
            live = (blk * unroll + k) < total
            pr = jnp.where(live, f["npr"], pr)
            pi_ = jnp.where(live, f["npi"], pi_)
            n2_prev = jnp.where(live, f["n2"], n2_prev)

        _d = functools.partial(_dot, precision=precision)
        # --- block-exit renormalization adjoint seeds (dp, dn2)
        dpr_in, dpi_in = dpr_s[:], dpi_s[:]
        inv = jax.lax.rsqrt(jnp.maximum(n2_prev, norm_eps))
        dpr = dpr_in * inv
        dpi = dpi_in * inv
        dinv = jnp.sum(dpr_in * pr + dpi_in * pi_, axis=0, keepdims=True)
        dn2 = jnp.where(n2_prev > norm_eps,
                        -0.5 * dinv * inv * inv * inv,
                        jnp.zeros_like(dinv))

        dacr, daci = acr_s[:], aci_s[:]
        darr, dari = arr_s[:], ari_s[:]
        dapc, daps = apc_s[:], aps_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            pr0, pi0, n2p, g2r, g2i, yr, yi, rur, rui = saved[k]
            # cheap scalar tail recompute (VPU only)
            ehat = 2.0 * jnp.sum(yr * rur + yi * rui, axis=0, keepdims=True)
            n2p_c = jnp.maximum(n2p, norm_eps)
            e = ehat / n2p_c
            arg = jnp.maximum(1.0 + e * s, log_eps)

            # rotate adjoint: np = (yr*pc + yi*ps, yi*pc - yr*ps)
            dyr = dpr * pc - dpi * ps
            dyi = dpr * ps + dpi * pc
            g_dpc = jnp.sum(dpr * yr + dpi * yi, axis=1, keepdims=True)
            g_dps = jnp.sum(dpr * yi - dpi * yr, axis=1, keepdims=True)
            # n2 = sum(y.y) adjoint (dn2 carried from the NEXT step's
            # e-division / the block-exit renorm)
            dyr = dyr + 2.0 * yr * dn2
            dyi = dyi + 2.0 * yi * dn2
            # loss adjoint: acc -= log(arg); arg = max(1 + e*s, eps);
            # e = ehat / max(n2_prev, eps)
            darg = jnp.where(arg > log_eps,
                             -g_ref[:] / arg, jnp.zeros_like(arg))
            de = darg * s
            ds = darg * e
            dehat = de / n2p_c
            dn2_new = jnp.where(n2p > norm_eps,
                                -de * e / n2p_c, jnp.zeros_like(de))
            # ehat = 2 sum(y . ru)
            dyr = dyr + 2.0 * dehat * rur
            dyi = dyi + 2.0 * dehat * rui
            drur = 2.0 * dehat * yr
            drui = 2.0 * dehat * yi
            # ru = R y adjoint (also accumulates dR)
            dyr = dyr + _d(rr.T, drur) + _d(ri.T, drui)
            dyi = dyi - _d(ri.T, drur) + _d(rr.T, drui)
            g_drr = _d(drur, yr.T) + _d(drui, yi.T)
            g_dri = _d(drui, yr.T) - _d(drur, yi.T)
            # y = g1 + s*g2
            dg1r, dg1i = dyr, dyi
            dg2r = s * dyr
            dg2i = s * dyi
            ds = ds + jnp.sum(dyr * g2r + dyi * g2i, axis=0, keepdims=True)
            # g1 = C p adjoint
            dprn = _d(cr.T, dg1r) + _d(ci.T, dg1i)
            dpin = -_d(ci.T, dg1r) + _d(cr.T, dg1i)
            g_dcr = _d(dg1r, pr0.T) + _d(dg1i, pi0.T)
            g_dci = _d(dg1i, pr0.T) - _d(dg1r, pi0.T)
            # g2 = R p adjoint
            dprn = dprn + _d(rr.T, dg2r) + _d(ri.T, dg2i)
            dpin = dpin - _d(ri.T, dg2r) + _d(rr.T, dg2i)
            g_drr = g_drr + _d(dg2r, pr0.T) + _d(dg2i, pi0.T)
            g_dri = g_dri + _d(dg2i, pr0.T) - _d(dg2r, pi0.T)

            live = (blk * unroll + k) < total
            dse_ref[0, k:k + 1, :] = jnp.where(live, ds,
                                               jnp.zeros_like(ds))
            dpr = jnp.where(live, dprn, dpr)
            dpi = jnp.where(live, dpin, dpi)
            dn2 = jnp.where(live, dn2_new, dn2)
            dacr = jnp.where(live, dacr + g_dcr, dacr)
            daci = jnp.where(live, daci + g_dci, daci)
            darr = jnp.where(live, darr + g_drr, darr)
            dari = jnp.where(live, dari + g_dri, dari)
            dapc = jnp.where(live, dapc + g_dpc, dapc)
            daps = jnp.where(live, daps + g_dps, daps)
        # dn2 now sits on the block-entry norm — a constant 1 (the entry
        # state is normalized): discard.

        dpr_s[:] = dpr
        dpi_s[:] = dpi
        acr_s[:] = dacr
        aci_s[:] = daci
        arr_s[:] = darr
        ari_s[:] = dari
        apc_s[:] = dapc
        aps_s[:] = daps

        @pl.when(i == n_blocks - 1)
        def _emit():
            dcr_ref[:] = acr_s[:]
            dci_ref[:] = aci_s[:]
            drr_ref[:] = arr_s[:]
            dri_ref[:] = ari_s[:]
            dpc_ref[:] = apc_s[:]
            dps_ref[:] = aps_s[:]
            dp0r_ref[:] = dpr_s[:]
            dp0i_ref[:] = dpi_s[:]

    return kernel


@functools.lru_cache(maxsize=64)
def _psi_fused_nll_factory(cfg: CMPSConfig, B: int, T: int, unroll: int,
                           interpret: bool, precision: str = "highest",
                           defer_norm: bool = False):
    """Build the custom-VJP fused NLL for fixed (cfg, shapes). The fused
    primal returns PER-EXAMPLE losses [B]; its VJP takes the matching [B]
    cotangent (so both mean losses and per-example consumers — e.g.
    importance-weighted ELBOs — differentiate correctly)."""
    D = cfg.bond_dim
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    fwd_kernel = _make_psi_fwd_kernel(cfg, unroll, n_steps, precision,
                                      defer_norm)
    bwd_kernel = (_make_psi_bwd_kernel_defer(cfg, unroll, n_steps, n_blocks,
                                             precision) if defer_norm else
                  _make_psi_bwd_kernel(cfg, unroll, n_steps, n_blocks,
                                       precision))
    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    sem_bwd = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                   vmem_limit_bytes=100 * 1024 * 1024)

    def run_fwd(cr, ci, rr, ri, pc, ps, s0r, s0i, se):
        se3 = se.reshape(n_blocks, unroll, B)
        loss, ckr, cki = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
                _full((D, B)), _full((D, B)),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, D, B), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, D, B), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, D, B), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, D, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, B), jnp.float32),
                pltpu.VMEM((D, B), jnp.float32),
                pltpu.VMEM((1, B), jnp.float32),
            ],
            compiler_params=sem,
            interpret=interpret,
        )(se3, s0r, s0i, cr, ci, rr, ri, pc, ps)
        return loss[-1, 0], (ckr, cki)

    def run_bwd(cr, ci, rr, ri, pc, ps, se, ckr, cki, g):
        rev3 = lambda i: (n_blocks - 1 - i, 0, 0)
        se3 = se.reshape(n_blocks, unroll, B)
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, B), rev3),
                _full((1, B)),
                pl.BlockSpec((1, D, B), rev3),
                pl.BlockSpec((1, D, B), rev3),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
            ],
            out_specs=[
                pl.BlockSpec((1, unroll, B), rev3),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
                _full((D, B)), _full((D, B)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, unroll, B), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                jax.ShapeDtypeStruct((D, B), jnp.float32),
                jax.ShapeDtypeStruct((D, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, B), jnp.float32),
                pltpu.VMEM((D, B), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, 1), jnp.float32),
                pltpu.VMEM((D, 1), jnp.float32),
            ],
            compiler_params=sem_bwd,
            interpret=interpret,
        )(se3, g, ckr, cki, cr, ci, rr, ri, pc, ps)
        return (outs[0].reshape(t_pad, B),) + tuple(outs[1:])

    @jax.custom_vjp
    def fused(cr, ci, rr, ri, pc, ps, s0r, s0i, se):
        return run_fwd(cr, ci, rr, ri, pc, ps, s0r, s0i, se)[0]

    def fused_fwd(cr, ci, rr, ri, pc, ps, s0r, s0i, se):
        loss, (ckr, cki) = run_fwd(cr, ci, rr, ri, pc, ps, s0r, s0i, se)
        return loss, (cr, ci, rr, ri, pc, ps, se, ckr, cki)

    def fused_bwd(res, g):
        cr, ci, rr, ri, pc, ps, se, ckr, cki = res
        # g: per-example loss cotangent [B] -> lane-weighted inside kernel
        (dse, dcr, dci, drr, dri, dpc, dps, dp0r, dp0i) = run_bwd(
            cr, ci, rr, ri, pc, ps, se, ckr, cki, g[None, :])
        return (dcr, dci, drr, dri, dpc, dps, dp0r, dp0i, dse)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def resolve_layout(cfg: CMPSConfig, layout: Optional[str] = None) -> str:
    """Resolve a kernel-layout request ("auto"/"split"/"block"/None) to a
    concrete layout. "auto" picks the block-complex layout
    (ops/pallas_block.py — full-width MXU dots, measured faster on v5e at
    every supported D) whenever bond_dim % 4 == 0."""
    layout = layout if layout is not None else cfg.kernel_layout
    if layout == "auto":
        from .pallas_block import supports_block
        return "block" if supports_block(cfg) else "split"
    if layout not in ("split", "block"):
        raise ValueError(
            f"layout must be 'auto', 'split', or 'block', got {layout!r}")
    return layout


def auto_unroll(D: int, cols: int, unroll: Optional[int]) -> int:
    """Pick the unroll so the reverse sweep's live intermediates (~40
    [D, cols] arrays per step empirically) fit the raised VMEM ceiling."""
    if unroll is not None:
        return unroll
    per_step = 56 * D * cols * 4
    return int(max(2, min(DEFAULT_UNROLL, (80 << 20) // max(per_step, 1))))


# Budget calibrated to the MEASURED compile boundary on v5e (see
# fused_supported): the scoped-VMEM request is capped at 100 MiB, but the
# backend's compiler falls over before the estimate reaches it.
FUSED_VMEM_LIMIT = 48 * 1024 * 1024


def fused_vmem_bytes(bond_dim: int, cols: int, unroll: int = 2) -> int:
    """Conservative VMEM estimate for the block-layout custom-VJP backward
    at a given unroll: the recompute saves ~4 stacked [2D, cols]
    fp32-equivalents per unrolled step, plus the state/cotangent scratch,
    the streamed checkpoint block, and ~10 [2D,2D] constants/accumulators
    (stacked cs/csT included)."""
    d2 = 2 * bond_dim
    per_step = 4 * d2 * cols * 4 + cols * 8
    fixed = 4 * d2 * cols * 4 + 10 * d2 * d2 * 4
    return unroll * per_step + fixed


def fused_supported(cfg: CMPSConfig, batch: int,
                    rank: Optional[int] = None) -> bool:
    """Do the fused training kernels fit this backend at (D, B, rank), at
    the MINIMUM unroll of 2? Above this the chunked-remat XLA scan is the
    fallback (training.nll_fn_for applies it automatically).

    Boundary MEASURED on v5e (r3, tools-era probes): full-rank rho at B=8
    compiles and runs through **D=192** (and D=256 at initial_rank=64);
    full-rank D=256 at B=8 crashes the backend's remote compile helper.
    The 48 MiB budget on the estimate reproduces exactly that boundary
    (D=192 full rank -> 34 MB ok; D=256 rank=64 -> 23 MB ok; D=256 full
    rank -> 61 MB rejected). psi scales far beyond — its lane count is B,
    not B*rank. For D beyond the ceiling, shrink minibatch_size /
    initial_rank, or shard the bond dimension (TP) — see README's scaling
    notes."""
    if rank is None:
        rank = cfg.initial_rank or cfg.bond_dim
    cols = batch * rank
    return fused_vmem_bytes(cfg.bond_dim, cols, 2) <= FUSED_VMEM_LIMIT


def psi_nll_pallas_trainable_from_state(params, cfg: CMPSConfig, signals,
                                        psi0_pair, *,
                                        unroll: Optional[int] = None,
                                        interpret: Optional[bool] = None,
                                        precision: str = "highest",
                                        reduce: str = "mean",
                                        defer_norm: bool = False,
                                        layout: Optional[str] = None):
    """Fused NLL with PER-EXAMPLE initial states [B, D] (pair) — the fused
    backward already produces the initial-state cotangent, so gradients
    flow into whatever network produced psi0 (used by the latent-
    conditioned model, models/latent.py). ``reduce="mean"`` returns the
    batch-mean loss; ``reduce="none"`` returns true per-example losses [B]
    (the kernel VJP takes per-example cotangents, so both differentiate
    correctly)."""
    if reduce not in ("mean", "none"):
        raise ValueError(f"reduce must be 'mean' or 'none', got {reduce!r}")
    if resolve_layout(cfg, layout) == "block":
        from .pallas_block import psi_nll_block_trainable_from_state
        return psi_nll_block_trainable_from_state(
            params, cfg, signals, psi0_pair, unroll=unroll,
            interpret=interpret, precision=precision, reduce=reduce,
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
    unroll = auto_unroll(D, B, unroll)
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = _pad_rows(incs, t_pad)
    pr0, pi0 = psi0_pair                              # [B, D]
    fused = _psi_fused_nll_factory(cfg, B, T, unroll, interpret, precision,
                                   defer_norm)
    loss = fused(cc.Cr, cc.Ci, cc.Rr, cc.Ri,
                 cc.p_c[:, None], cc.p_s[:, None], pr0.T, pi0.T, se)
    return jnp.mean(loss) if reduce == "mean" else loss


def psi_nll_pallas_trainable(params, cfg: CMPSConfig, signals, *,
                             unroll: Optional[int] = None,
                             interpret: Optional[bool] = None,
                             precision: str = "highest",
                             defer_norm: bool = False,
                             layout: Optional[str] = None):
    """Differentiable fused NLL: semantics of core.psi_nll with forward AND
    backward as single Pallas kernels. Gradients flow to every parameter
    (A via the signal scaling, R/C/freqs via the derived constants,
    psi_0 via the initial state) — the derivation chain outside the
    kernels is ordinary JAX."""
    if resolve_layout(cfg, layout) == "block":
        from .pallas_block import psi_nll_block_trainable
        return psi_nll_block_trainable(
            params, cfg, signals, unroll=unroll, interpret=interpret,
            precision=precision, defer_norm=defer_norm)
    if precision == "high":
        raise ValueError(
            "kernel_precision='high' (bf16x3) is only implemented in the "
            "block kernel layout (ops/pallas_block.py)")
    if interpret is None:
        interpret = not _on_tpu()
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    unroll = auto_unroll(D, B, unroll)
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = _pad_rows(incs, t_pad)
    pr0, pi0 = core.psi0(params, cfg)
    s0r = jnp.broadcast_to(pr0[:, None], (D, B))
    s0i = jnp.broadcast_to(pi0[:, None], (D, B))

    fused = _psi_fused_nll_factory(cfg, B, T, unroll, interpret, precision,
                                   defer_norm)
    return jnp.mean(fused(cc.Cr, cc.Ci, cc.Rr, cc.Ri,
                          cc.p_c[:, None], cc.p_s[:, None], s0r, s0i, se))


# ===========================================================================
# rho (purification factor) forward + backward kernels
# ===========================================================================

def _rho_fwd_step(ccr, cci, rcr, rci, xtr, xti, pc, ps, z, zt, hr, hi, s,
                  log_eps, norm_eps, precision="highest"):
    """One factor-form forward step (semantics of ops/pallas_scan.py)."""
    _d = functools.partial(_dot, precision=precision)

    def seg(row):
        return _d(_d(row, z), zt)

    a1r = _d(ccr, hr) - _d(cci, hi)
    a1i = _d(ccr, hi) + _d(cci, hr)
    a2r = _d(rcr, hr) - _d(rci, hi)
    a2i = _d(rcr, hi) + _d(rci, hr)
    yr = a1r + s * a2r
    yi = a1i + s * a2i
    gxr = _d(xtr, yr) - _d(xti, yi)
    gxi = _d(xtr, yi) + _d(xti, yr)
    e_part = jnp.sum(yr * gxr + yi * gxi, axis=0, keepdims=True)
    e_bc = seg(e_part)
    arg = jnp.maximum(1.0 + e_bc * s, log_eps)
    tr_part = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
    tr_bc = seg(tr_part)
    inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
    tyr = yr * inv
    tyi = yi * inv
    nhr = tyr * pc - tyi * ps                   # rotate: H <- P H
    nhi = tyr * ps + tyi * pc
    return dict(a2r=a2r, a2i=a2i, yr=yr, yi=yi, gxr=gxr, gxi=gxi,
                e_bc=e_bc, arg=arg, tr_bc=tr_bc, inv=inv,
                tyr=tyr, tyi=tyi, nhr=nhr, nhi=nhi)


def _rho_fwd_step_defer(ccr, cci, rcr, rci, xtr, xti, pc, ps, z, zt, hr, hi,
                        trp, s, log_eps, norm_eps, precision="highest"):
    """One factor-form forward step, DEFERRED normalization (see
    _psi_fwd_step_defer): the factor stays unnormalized within a block,
    the expectation divides by the previous step's broadcast trace
    (e = seg(ehat)/tr_prev — exactly the normalized value), trace
    renormalization happens once at block exit."""
    _d = functools.partial(_dot, precision=precision)

    def seg(row):
        return _d(_d(row, z), zt)

    a1r = _d(ccr, hr) - _d(cci, hi)
    a1i = _d(ccr, hi) + _d(cci, hr)
    a2r = _d(rcr, hr) - _d(rci, hi)
    a2i = _d(rcr, hi) + _d(rci, hr)
    yr = a1r + s * a2r
    yi = a1i + s * a2i
    gxr = _d(xtr, yr) - _d(xti, yi)
    gxi = _d(xtr, yi) + _d(xti, yr)
    ehat_bc = seg(jnp.sum(yr * gxr + yi * gxi, axis=0, keepdims=True))
    trp_c = jnp.maximum(trp, norm_eps)
    e_bc = ehat_bc / trp_c
    arg = jnp.maximum(1.0 + e_bc * s, log_eps)
    tr_bc = seg(jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True))
    nhr = yr * pc - yi * ps                     # rotate: H <- P H, no norm
    nhi = yr * ps + yi * pc
    return dict(a2r=a2r, a2i=a2i, yr=yr, yi=yi, gxr=gxr, gxi=gxi,
                ehat_bc=ehat_bc, e_bc=e_bc, arg=arg, tr_bc=tr_bc,
                nhr=nhr, nhi=nhi)


def _make_rho_fwd_kernel(cfg: CMPSConfig, unroll: int, total: int,
                         rank: int, precision: str = "highest",
                         defer_norm: bool = False):
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref, h0r_ref, h0i_ref, ccr_ref, cci_ref, rcr_ref, rci_ref,
               xtr_ref, xti_ref, pc_ref, ps_ref, z_ref, zt_ref,
               loss_ref, ckr_ref, cki_ref,
               hr_s, hi_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            hr_s[:] = h0r_ref[:]
            hi_s[:] = h0i_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ccr, cci = ccr_ref[:], cci_ref[:]
        rcr, rci = rcr_ref[:], rci_ref[:]
        xtr, xti = xtr_ref[:], xti_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]
        z, zt = z_ref[:], zt_ref[:]

        hr, hi = hr_s[:], hi_s[:]
        ckr_ref[0] = hr
        cki_ref[0] = hi
        acc = acc_s[:]
        if defer_norm:
            trp = jnp.ones_like(acc)
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _rho_fwd_step_defer(ccr, cci, rcr, rci, xtr, xti, pc,
                                        ps, z, zt, hr, hi, trp, s, log_eps,
                                        norm_eps, precision)
                live = (i * unroll + k) < total
                acc = jnp.where(live, acc - jnp.log(f["arg"]), acc)
                hr = jnp.where(live, f["nhr"], hr)
                hi = jnp.where(live, f["nhi"], hi)
                trp = jnp.where(live, f["tr_bc"], trp)
            # block-exit renormalization (rotation preserves the trace)
            inv = jax.lax.rsqrt(jnp.maximum(trp, norm_eps))
            hr = hr * inv
            hi = hi * inv
        else:
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _rho_fwd_step(ccr, cci, rcr, rci, xtr, xti, pc, ps, z,
                                  zt, hr, hi, s, log_eps, norm_eps,
                                  precision)
                live = (i * unroll + k) < total
                acc = jnp.where(live, acc - jnp.log(f["arg"]), acc)
                hr = jnp.where(live, f["nhr"], hr)
                hi = jnp.where(live, f["nhi"], hi)

        hr_s[:] = hr
        hi_s[:] = hi
        acc_s[:] = acc
        loss_ref[0] = _dot(acc, z) * (1.0 / rank)

    return kernel


def _make_rho_bwd_kernel(cfg: CMPSConfig, unroll: int, total: int,
                         n_blocks: int, inv_batch_rank: float,
                         precision: str = "highest"):
    """inv_batch_rank = 1 / (B * rank): d(mean loss)/d(acc lane)."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref, ckr_ref, cki_ref, ccr_ref, cci_ref, rcr_ref, rci_ref,
               xtr_ref, xti_ref, pc_ref, ps_ref, z_ref, zt_ref,
               dse_ref, dccr_ref, dcci_ref, drcr_ref, drci_ref,
               dxtr_ref, dxti_ref, dpc_ref, dps_ref, dh0r_ref, dh0i_ref,
               dhr_s, dhi_s, accr_s, acci_s, arcr_s, arci_s,
               axtr_s, axti_s, apc_s, aps_s):
        i = pl.program_id(0)
        blk = n_blocks - 1 - i

        @pl.when(i == 0)
        def _init():
            for ref in (dhr_s, dhi_s, accr_s, acci_s, arcr_s, arci_s,
                        axtr_s, axti_s, apc_s, aps_s):
                ref[:] = jnp.zeros_like(ref)

        ccr, cci = ccr_ref[:], cci_ref[:]
        rcr, rci = rcr_ref[:], rci_ref[:]
        xtr, xti = xtr_ref[:], xti_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]
        z, zt = z_ref[:], zt_ref[:]

        def seg(row):
            return _dot(_dot(row, z, precision=precision), zt,
                        precision=precision)

        # --- forward recompute, retaining entry states + GEMM products
        hr = ckr_ref[0]
        hi = cki_ref[0]
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _rho_fwd_step(ccr, cci, rcr, rci, xtr, xti, pc, ps, z, zt,
                              hr, hi, s, log_eps, norm_eps, precision)
            saved.append((hr, hi, f["a2r"], f["a2i"], f["yr"], f["yi"],
                          f["gxr"], f["gxi"]))
            live = (blk * unroll + k) < total
            hr = jnp.where(live, f["nhr"], hr)
            hi = jnp.where(live, f["nhi"], hi)

        _d = functools.partial(_dot, precision=precision)
        # --- reverse sweep
        dhr, dhi = dhr_s[:], dhi_s[:]
        g_ccr, g_cci = accr_s[:], acci_s[:]
        g_rcr, g_rci = arcr_s[:], arci_s[:]
        g_xtr, g_xti = axtr_s[:], axti_s[:]
        g_pc, g_ps = apc_s[:], aps_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            hr0, hi0, a2r, a2i, yr, yi, gxr, gxi = saved[k]
            # scalar tail recompute (VPU + two skinny seg matmuls)
            e_bc = seg(jnp.sum(yr * gxr + yi * gxi, axis=0, keepdims=True))
            arg = jnp.maximum(1.0 + e_bc * s, log_eps)
            tr_bc = seg(jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True))
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
            tyr = yr * inv
            tyi = yi * inv

            # rotate adjoint: nh = (tyr*pc - tyi*ps, tyr*ps + tyi*pc)
            dtyr = dhr * pc + dhi * ps
            dtyi = -dhr * ps + dhi * pc
            d_pc = jnp.sum(dhr * tyr + dhi * tyi, axis=1, keepdims=True)
            d_ps = jnp.sum(dhi * tyr - dhr * tyi, axis=1, keepdims=True)
            # normalize adjoint
            dyr = dtyr * inv
            dyi = dtyi * inv
            dinv = jnp.sum(dtyr * yr + dtyi * yi, axis=0, keepdims=True)
            dtr_bc = jnp.where(tr_bc > norm_eps,
                               -0.5 * dinv * inv * inv * inv,
                               jnp.zeros_like(dinv))
            dtr_part = seg(dtr_bc)          # seg broadcast is self-adjoint
            dyr = dyr + 2.0 * yr * dtr_part
            dyi = dyi + 2.0 * yi * dtr_part
            # loss adjoint
            darg = jnp.where(arg > log_eps, -inv_batch_rank / arg,
                             jnp.zeros_like(arg))
            de_bc = darg * s
            ds = darg * e_bc
            de_part = seg(de_bc)
            # e_part = sum(y . gx)
            dyr = dyr + de_part * gxr
            dyi = dyi + de_part * gxi
            dgxr = de_part * yr
            dgxi = de_part * yi
            # gx = Xt y adjoint
            dyr = dyr + _d(xtr.T, dgxr) + _d(xti.T, dgxi)
            dyi = dyi - _d(xti.T, dgxr) + _d(xtr.T, dgxi)
            d_xtr = _d(dgxr, yr.T) + _d(dgxi, yi.T)
            d_xti = _d(dgxi, yr.T) - _d(dgxr, yi.T)
            # y = a1 + s*a2
            da1r, da1i = dyr, dyi
            da2r = s * dyr
            da2i = s * dyi
            ds = ds + jnp.sum(dyr * a2r + dyi * a2i, axis=0, keepdims=True)
            # a1 = conj(C) h adjoint
            dhrn = _d(ccr.T, da1r) + _d(cci.T, da1i)
            dhin = -_d(cci.T, da1r) + _d(ccr.T, da1i)
            d_ccr = _d(da1r, hr0.T) + _d(da1i, hi0.T)
            d_cci = _d(da1i, hr0.T) - _d(da1r, hi0.T)
            # a2 = conj(R) h adjoint
            dhrn = dhrn + _d(rcr.T, da2r) + _d(rci.T, da2i)
            dhin = dhin - _d(rci.T, da2r) + _d(rcr.T, da2i)
            d_rcr = _d(da2r, hr0.T) + _d(da2i, hi0.T)
            d_rci = _d(da2i, hr0.T) - _d(da2r, hi0.T)

            live = (blk * unroll + k) < total
            dse_ref[0, k:k + 1, :] = jnp.where(live, ds,
                                               jnp.zeros_like(ds))
            dhr = jnp.where(live, dhrn, dhr)
            dhi = jnp.where(live, dhin, dhi)
            g_ccr = jnp.where(live, g_ccr + d_ccr, g_ccr)
            g_cci = jnp.where(live, g_cci + d_cci, g_cci)
            g_rcr = jnp.where(live, g_rcr + d_rcr, g_rcr)
            g_rci = jnp.where(live, g_rci + d_rci, g_rci)
            g_xtr = jnp.where(live, g_xtr + d_xtr, g_xtr)
            g_xti = jnp.where(live, g_xti + d_xti, g_xti)
            g_pc = jnp.where(live, g_pc + d_pc, g_pc)
            g_ps = jnp.where(live, g_ps + d_ps, g_ps)

        dhr_s[:] = dhr
        dhi_s[:] = dhi
        accr_s[:] = g_ccr
        acci_s[:] = g_cci
        arcr_s[:] = g_rcr
        arci_s[:] = g_rci
        axtr_s[:] = g_xtr
        axti_s[:] = g_xti
        apc_s[:] = g_pc
        aps_s[:] = g_ps

        @pl.when(i == n_blocks - 1)
        def _emit():
            dccr_ref[:] = accr_s[:]
            dcci_ref[:] = acci_s[:]
            drcr_ref[:] = arcr_s[:]
            drci_ref[:] = arci_s[:]
            dxtr_ref[:] = axtr_s[:]
            dxti_ref[:] = axti_s[:]
            dpc_ref[:] = apc_s[:]
            dps_ref[:] = aps_s[:]
            dh0r_ref[:] = dhr_s[:]
            dh0i_ref[:] = dhi_s[:]

    return kernel


def _make_rho_bwd_kernel_defer(cfg: CMPSConfig, unroll: int, total: int,
                               n_blocks: int, inv_batch_rank: float,
                               precision: str = "highest"):
    """Deferred-normalization adjoint for the factor form (see
    _make_psi_bwd_kernel_defer): carries the broadcast-trace cotangent dtr
    alongside dh; no per-step normalize adjoint."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps

    def kernel(se_ref, ckr_ref, cki_ref, ccr_ref, cci_ref, rcr_ref, rci_ref,
               xtr_ref, xti_ref, pc_ref, ps_ref, z_ref, zt_ref,
               dse_ref, dccr_ref, dcci_ref, drcr_ref, drci_ref,
               dxtr_ref, dxti_ref, dpc_ref, dps_ref, dh0r_ref, dh0i_ref,
               dhr_s, dhi_s, accr_s, acci_s, arcr_s, arci_s,
               axtr_s, axti_s, apc_s, aps_s):
        i = pl.program_id(0)
        blk = n_blocks - 1 - i

        @pl.when(i == 0)
        def _init():
            for ref in (dhr_s, dhi_s, accr_s, acci_s, arcr_s, arci_s,
                        axtr_s, axti_s, apc_s, aps_s):
                ref[:] = jnp.zeros_like(ref)

        ccr, cci = ccr_ref[:], cci_ref[:]
        rcr, rci = rcr_ref[:], rci_ref[:]
        xtr, xti = xtr_ref[:], xti_ref[:]
        pc, ps = pc_ref[:], ps_ref[:]
        z, zt = z_ref[:], zt_ref[:]

        def seg(row):
            return _dot(_dot(row, z, precision=precision), zt,
                        precision=precision)

        # --- forward recompute of the unnormalized chain from checkpoint
        hr = ckr_ref[0]
        hi = cki_ref[0]
        trp = jnp.ones_like(se_ref[0, 0:1, :])
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _rho_fwd_step_defer(ccr, cci, rcr, rci, xtr, xti, pc, ps,
                                    z, zt, hr, hi, trp, s, log_eps,
                                    norm_eps, precision)
            saved.append((hr, hi, trp, f["a2r"], f["a2i"], f["yr"],
                          f["yi"], f["gxr"], f["gxi"]))
            live = (blk * unroll + k) < total
            hr = jnp.where(live, f["nhr"], hr)
            hi = jnp.where(live, f["nhi"], hi)
            trp = jnp.where(live, f["tr_bc"], trp)

        _d = functools.partial(_dot, precision=precision)
        # --- block-exit renormalization adjoint seeds (dh, dtr)
        dhr_in, dhi_in = dhr_s[:], dhi_s[:]
        inv = jax.lax.rsqrt(jnp.maximum(trp, norm_eps))
        dhr = dhr_in * inv
        dhi = dhi_in * inv
        dinv = jnp.sum(dhr_in * hr + dhi_in * hi, axis=0, keepdims=True)
        # inv depends on the broadcast trace per lane; the seg fold to the
        # per-lane tr_part happens at the consuming step below
        dtr = jnp.where(trp > norm_eps,
                        -0.5 * dinv * inv * inv * inv,
                        jnp.zeros_like(dinv))

        g_ccr, g_cci = accr_s[:], acci_s[:]
        g_rcr, g_rci = arcr_s[:], arci_s[:]
        g_xtr, g_xti = axtr_s[:], axti_s[:]
        g_pc, g_ps = apc_s[:], aps_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            hr0, hi0, trp_k, a2r, a2i, yr, yi, gxr, gxi = saved[k]
            # scalar tail recompute (VPU + skinny seg matmuls)
            ehat_bc = seg(jnp.sum(yr * gxr + yi * gxi, axis=0,
                                  keepdims=True))
            trp_c = jnp.maximum(trp_k, norm_eps)
            e_bc = ehat_bc / trp_c
            arg = jnp.maximum(1.0 + e_bc * s, log_eps)

            # rotate adjoint: nh = (yr*pc - yi*ps, yr*ps + yi*pc)
            dyr = dhr * pc + dhi * ps
            dyi = -dhr * ps + dhi * pc
            d_pc = jnp.sum(dhr * yr + dhi * yi, axis=1, keepdims=True)
            d_ps = jnp.sum(dhi * yr - dhr * yi, axis=1, keepdims=True)
            # tr_bc = seg(sum(y.y)) adjoint (dtr carried from the next
            # step's e-division / the block-exit renorm)
            dtr_part = seg(dtr)             # seg broadcast is self-adjoint
            dyr = dyr + 2.0 * yr * dtr_part
            dyi = dyi + 2.0 * yi * dtr_part
            # loss adjoint: arg = max(1 + e_bc*s, eps);
            # e_bc = seg(e_part) / max(tr_prev_bc, eps)
            darg = jnp.where(arg > log_eps, -inv_batch_rank / arg,
                             jnp.zeros_like(arg))
            de_bc = darg * s
            ds = darg * e_bc
            dtr_new = jnp.where(trp_k > norm_eps,
                                -de_bc * e_bc / trp_c,
                                jnp.zeros_like(de_bc))
            de_part = seg(de_bc / trp_c)
            # e_part = sum(y . gx)
            dyr = dyr + de_part * gxr
            dyi = dyi + de_part * gxi
            dgxr = de_part * yr
            dgxi = de_part * yi
            # gx = Xt y adjoint
            dyr = dyr + _d(xtr.T, dgxr) + _d(xti.T, dgxi)
            dyi = dyi - _d(xti.T, dgxr) + _d(xtr.T, dgxi)
            d_xtr = _d(dgxr, yr.T) + _d(dgxi, yi.T)
            d_xti = _d(dgxi, yr.T) - _d(dgxr, yi.T)
            # y = a1 + s*a2
            da1r, da1i = dyr, dyi
            da2r = s * dyr
            da2i = s * dyi
            ds = ds + jnp.sum(dyr * a2r + dyi * a2i, axis=0, keepdims=True)
            # a1 = conj(C) h adjoint
            dhrn = _d(ccr.T, da1r) + _d(cci.T, da1i)
            dhin = -_d(cci.T, da1r) + _d(ccr.T, da1i)
            d_ccr = _d(da1r, hr0.T) + _d(da1i, hi0.T)
            d_cci = _d(da1i, hr0.T) - _d(da1r, hi0.T)
            # a2 = conj(R) h adjoint
            dhrn = dhrn + _d(rcr.T, da2r) + _d(rci.T, da2i)
            dhin = dhin - _d(rci.T, da2r) + _d(rcr.T, da2i)
            d_rcr = _d(da2r, hr0.T) + _d(da2i, hi0.T)
            d_rci = _d(da2i, hr0.T) - _d(da2r, hi0.T)

            live = (blk * unroll + k) < total
            dse_ref[0, k:k + 1, :] = jnp.where(live, ds,
                                               jnp.zeros_like(ds))
            dhr = jnp.where(live, dhrn, dhr)
            dhi = jnp.where(live, dhin, dhi)
            dtr = jnp.where(live, dtr_new, dtr)
            g_ccr = jnp.where(live, g_ccr + d_ccr, g_ccr)
            g_cci = jnp.where(live, g_cci + d_cci, g_cci)
            g_rcr = jnp.where(live, g_rcr + d_rcr, g_rcr)
            g_rci = jnp.where(live, g_rci + d_rci, g_rci)
            g_xtr = jnp.where(live, g_xtr + d_xtr, g_xtr)
            g_xti = jnp.where(live, g_xti + d_xti, g_xti)
            g_pc = jnp.where(live, g_pc + d_pc, g_pc)
            g_ps = jnp.where(live, g_ps + d_ps, g_ps)
        # leftover dtr sits on the block-entry trace (a constant 1): discard

        dhr_s[:] = dhr
        dhi_s[:] = dhi
        accr_s[:] = g_ccr
        acci_s[:] = g_cci
        arcr_s[:] = g_rcr
        arci_s[:] = g_rci
        axtr_s[:] = g_xtr
        axti_s[:] = g_xti
        apc_s[:] = g_pc
        aps_s[:] = g_ps

        @pl.when(i == n_blocks - 1)
        def _emit():
            dccr_ref[:] = accr_s[:]
            dcci_ref[:] = acci_s[:]
            drcr_ref[:] = arcr_s[:]
            drci_ref[:] = arci_s[:]
            dxtr_ref[:] = axtr_s[:]
            dxti_ref[:] = axti_s[:]
            dpc_ref[:] = apc_s[:]
            dps_ref[:] = aps_s[:]
            dh0r_ref[:] = dhr_s[:]
            dh0i_ref[:] = dhi_s[:]

    return kernel


@functools.lru_cache(maxsize=64)
def _rho_fused_nll_factory(cfg: CMPSConfig, B: int, T: int, rank: int,
                           unroll: int, interpret: bool,
                           precision: str = "highest",
                           defer_norm: bool = False):
    D = cfg.bond_dim
    BR = B * rank
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    fwd_kernel = _make_rho_fwd_kernel(cfg, unroll, n_steps, rank, precision,
                                      defer_norm)
    bwd_kernel = (_make_rho_bwd_kernel_defer(cfg, unroll, n_steps, n_blocks,
                                             1.0 / (B * rank), precision)
                  if defer_norm else
                  _make_rho_bwd_kernel(cfg, unroll, n_steps, n_blocks,
                                       1.0 / (B * rank), precision))
    # raised scoped-VMEM ceiling everywhere (v5e has 128 MiB physical
    # VMEM): the unrolled sweeps keep whole blocks of intermediates live
    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)
    sem_bwd = sem

    def run_fwd(ccr, cci, rcr, rci, xtr, xti, pc, ps, h0r, h0i, se, z, zt):
        se3 = se.reshape(n_blocks, unroll, BR)
        loss, ckr, cki = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, BR), lambda i: (i, 0, 0)),
                _full((D, BR)), _full((D, BR)),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
                _full((BR, B)), _full((B, BR)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, D, BR), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, D, BR), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, D, BR), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, D, BR), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, BR), jnp.float32),
                pltpu.VMEM((D, BR), jnp.float32),
                pltpu.VMEM((1, BR), jnp.float32),
            ],
            compiler_params=sem,
            interpret=interpret,
        )(se3, h0r, h0i, ccr, cci, rcr, rci, xtr, xti, pc, ps, z, zt)
        return jnp.mean(loss[-1, 0]), (ckr, cki)

    def run_bwd(ccr, cci, rcr, rci, xtr, xti, pc, ps, se, z, zt, ckr, cki):
        rev3 = lambda i: (n_blocks - 1 - i, 0, 0)
        se3 = se.reshape(n_blocks, unroll, BR)
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, BR), rev3),
                pl.BlockSpec((1, D, BR), rev3),
                pl.BlockSpec((1, D, BR), rev3),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
                _full((BR, B)), _full((B, BR)),
            ],
            out_specs=[
                pl.BlockSpec((1, unroll, BR), rev3),
                _full((D, D)), _full((D, D)), _full((D, D)), _full((D, D)),
                _full((D, D)), _full((D, D)),
                _full((D, 1)), _full((D, 1)),
                _full((D, BR)), _full((D, BR)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, unroll, BR), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, D), jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                jax.ShapeDtypeStruct((D, 1), jnp.float32),
                jax.ShapeDtypeStruct((D, BR), jnp.float32),
                jax.ShapeDtypeStruct((D, BR), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((D, BR), jnp.float32),
                pltpu.VMEM((D, BR), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, D), jnp.float32),
                pltpu.VMEM((D, 1), jnp.float32),
                pltpu.VMEM((D, 1), jnp.float32),
            ],
            compiler_params=sem_bwd,
            interpret=interpret,
        )(se3, ckr, cki, ccr, cci, rcr, rci, xtr, xti, pc, ps, z, zt)
        return (outs[0].reshape(t_pad, BR),) + tuple(outs[1:])

    @jax.custom_vjp
    def fused(ccr, cci, rcr, rci, xtr, xti, pc, ps, h0r, h0i, se, z, zt):
        return run_fwd(ccr, cci, rcr, rci, xtr, xti, pc, ps, h0r, h0i,
                       se, z, zt)[0]

    def fused_fwd(ccr, cci, rcr, rci, xtr, xti, pc, ps, h0r, h0i, se, z, zt):
        loss, (ckr, cki) = run_fwd(ccr, cci, rcr, rci, xtr, xti, pc, ps,
                                   h0r, h0i, se, z, zt)
        return loss, (ccr, cci, rcr, rci, xtr, xti, pc, ps, se, z, zt,
                      ckr, cki)

    def fused_bwd(res, g):
        (ccr, cci, rcr, rci, xtr, xti, pc, ps, se, z, zt, ckr, cki) = res
        (dse, dccr, dcci, drcr, drci, dxtr, dxti, dpc, dps,
         dh0r, dh0i) = run_bwd(ccr, cci, rcr, rci, xtr, xti, pc, ps, se,
                               z, zt, ckr, cki)
        zero_z = jnp.zeros_like(z)
        zero_zt = jnp.zeros_like(zt)
        return (g * dccr, g * dcci, g * drcr, g * drci, g * dxtr, g * dxti,
                g * dpc, g * dps, g * dh0r, g * dh0i, g * dse,
                zero_z, zero_zt)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def rho_nll_pallas_trainable(params, cfg: CMPSConfig, signals, *,
                             unroll: Optional[int] = None,
                             interpret: Optional[bool] = None,
                             precision: str = "highest",
                             defer_norm: bool = False,
                             layout: Optional[str] = None):
    """Differentiable fused NLL for the mixed-state model
    (purification-factor form; semantics of core.rho_nll): forward AND
    backward as single Pallas kernels. Gradients reach every parameter via
    the plain-JAX constants chain (W through H0, A through se, R/freqs
    through conj(C)/conj(R)/X^T/p)."""
    if resolve_layout(cfg, layout) == "block":
        from .pallas_block import rho_nll_block_trainable
        return rho_nll_block_trainable(
            params, cfg, signals, unroll=unroll, interpret=interpret,
            precision=precision, defer_norm=defer_norm)
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
    unroll = auto_unroll(D, B * rank, unroll)
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = jnp.repeat(_pad_rows(incs, t_pad), rank, axis=1)

    h0r, h0i, zmat = rho_factor_inputs(params, cfg, B)

    fused = _rho_fused_nll_factory(cfg, B, T, rank, unroll, interpret,
                                   precision, defer_norm)
    return fused(cc.Cr, -cc.Ci, cc.Rr, -cc.Ri, cc.Xr.T, cc.Xi.T,
                 cc.p_c[:, None], cc.p_s[:, None], h0r, h0i, se,
                 zmat, zmat.T)
