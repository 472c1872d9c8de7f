"""Block-complex fused training kernels: full-width MXU at D=64.

Same semantics as ops/pallas_grad.py (the fused custom-VJP cMPS training
loop; reference hot loop: model.py:132-203 for rho, model.py:257-334 for
psi), re-laid-out for the MXU's native 128x128 systolic tile:

1. **Complex algebra as one real block GEMM.** A complex matrix apply
   (M_r + i M_i)(x_r + i x_i) costs 4 real [D,D]@[D,N] dots in the split
   layout — at the flagship D=64 each dot fills only HALF the MXU's
   sublane/contraction width. Here every complex operator is embedded
   once (outside the kernel, in traced JAX) as the real block matrix
   Bk(M) = [[M_r, -M_i], [M_i, M_r]] acting on the stacked state
   [x_r; x_i] ([2D, N]): one [2D,2D]@[2D,N] dot — identical FLOPs, full
   128-wide MXU tiles at D=64, and 4x fewer dot dispatches.

2. **The per-step frame rotation folds into the step constants.** The
   rotating-frame cell ends each step with a constant elementwise phase
   (models/cell.py: psi <- conj(p) .* psi'', H <- p .* H''). That rotation
   would force half-swapping elementwise work on the stacked state, so it
   is folded into the following step's operators instead: with
   x_k = conj(p) .* t_k (psi), the chain C x_k becomes (C diag(conj p)) t_k
   — a COLUMN rescale of the constants, applied once outside the kernel.
   The kernel state t is the pre-rotation normalized state; the rotation
   (and its adjoint d_pc/d_ps) disappears from the hot loop entirely, and
   autodiff through the fold recovers the frequency gradients.

The custom_vjp boundary therefore sits at the BLOCK constants
(Ab = Bk(C~), Bb = Bk(R~), Rb/Xb = Bk(expectation op), stacked initial
state, se): everything from learnable parameters to those is plain
differentiable JAX — including the block embedding and the rotation fold —
so the kernels' emitted [2D,2D] cotangents flow back to R/freqs/A/psi0/W
through ordinary autodiff.

Numerics are pinned against the split-layout kernels and jax.grad of the
XLA scan (tests/test_pallas_block.py). Values differ from the split layout
only by fp reassociation inside the dots.

**No padding gates.** The split kernels gate every step on
``(block*unroll + k) < total``. Here the padding invariant does the work
instead: padded signal rows are ZERO (``_pad_rows``), so a padded step has
``arg = max(1 + e*0, eps) = 1`` — a zero loss term — and in the adjoint
``de = darg*s = 0`` with the state cotangent entering padded steps
identically zero (the loss never reads the post-boundary state), so every
padded-step parameter cotangent vanishes exactly. Padded ``dse`` rows are
nonzero garbage but autodiff of ``_pad_rows`` slices them off outside.
This removes 3-6 per-step lane-wide selects (including three [2D,2D]
accumulator selects per backward step) from the hot loops.

Layout constraints: the stacked state has 2D sublanes; kernels require
D % 4 == 0 (so 2D is a multiple of 8 — a full sublane tile). The split
kernels remain the fallback for other D (config.kernel_layout="auto").
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
from ..models import core
from ..models.cell import make_constants
from .pallas_grad import auto_unroll
from .pallas_scan import _full, _on_tpu, _pad_rows, rho_factor_inputs

# Shared by every FORWARD-ONLY pallas_call in this module (SDE samplers
# and forward-only NLL): raised scoped-VMEM ceiling matching the
# trainable kernels' 100 MiB. At the default 16 MiB large D*cols configs
# die in a clean scoped-VMEM OOM (measured r4: the full-rank rho D=256
# N=4 sampler needs 31.7 MiB and runs cleanly once raised).
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024)


def _dot(a, b, precision="highest"):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _split_bf16(x):
    """Split an fp32 array into (hi, lo) bf16 halves with
    hi + lo == x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (hi, lo)


def _make_dot_ops(precision):
    """(prep, dotf, tr) for the kernels' GEMMs.

    precision="high" emulates near-fp32 dots with THREE single-pass bf16
    MXU products (hi@hi + hi@lo + lo@hi, fp32 accumulation) — half the MXU
    passes of "highest" (6-pass fp32) at ~16-bit mantissa accuracy. Mosaic
    does not lower XLA's HIGH dot precision in kernels on this backend, so
    the classic bf16x3 decomposition is done by hand. prep() splits an
    operand once (reused across dots); tr() transposes a prepped operand.
    """
    if precision == "high":
        def dotf(a, b):
            ah, al = a
            bh, bl = b
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32,
                                  precision="default")
            return d(ah, bh) + d(ah, bl) + d(al, bh)
        return _split_bf16, dotf, lambda a: (a[0].T, a[1].T)
    dotf = functools.partial(_dot, precision=precision)
    return (lambda x: x), dotf, (lambda a: a.T)


_NT_DIMS = (((1,), (1,)), ((), ()))       # contract lanes of both operands


def _make_seg_dot(precision):
    """Skinny segment-matrix dot for the rho kernels' per-example
    reductions/broadcasts ([r,BR]@[BR,B] or [r,B]@[B,BR] with a 0/1
    segment matrix).

    "high": the 0/1 matrix is EXACT in bf16, so value @ z decomposes as
    hi @ z + lo @ z — TWO single bf16 passes reproducing the fp32 result
    to the hi/lo split's ~2^-17, well inside the mode's own dot rounding
    (vs 6 passes for a full fp32 dot). Other precisions: plain dot."""
    if precision == "high":
        def segdot(row, m):
            rh = row.astype(jnp.bfloat16)
            rl = (row - rh.astype(jnp.float32)).astype(jnp.bfloat16)
            mh = m.astype(jnp.bfloat16)
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32,
                                  precision="default")
            return d(rh, mh) + d(rl, mh)
        return segdot
    return functools.partial(_dot, precision=precision)


def _make_dot_ops_bwd(precision):
    """(prep, rec, dotf, dotnt) for the RESTRUCTURED backward kernels.

    dotnt(a, b) computes a @ b.T ([M, lanes] x [N, lanes] -> [M, N])
    directly via `lax.dot_general` lane contraction — no materialized
    per-step transposes. rec() reconstructs an fp32 view of a prepped
    operand (hi + lo for bf16x3 — rel err ~1e-5, below the mode's own dot
    rounding; identity for fp32 modes), so the reverse sweep reuses the
    splits SAVED during the block recompute instead of re-splitting
    (VERDICT r2 item 1: the wide-operand split overhead)."""
    if precision == "high":
        def dotf(a, b):
            ah, al = a
            bh, bl = b
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.float32,
                                  precision="default")
            return d(ah, bh) + d(ah, bl) + d(al, bh)

        def dotnt(a, b):
            ah, al = a
            bh, bl = b
            d = functools.partial(jax.lax.dot_general,
                                  dimension_numbers=_NT_DIMS,
                                  preferred_element_type=jnp.float32,
                                  precision="default")
            return d(ah, bh) + d(ah, bl) + d(al, bh)

        def rec(a):
            return a[0].astype(jnp.float32) + a[1].astype(jnp.float32)

        return _split_bf16, rec, dotf, dotnt

    dotf = functools.partial(_dot, precision=precision)

    def dotnt(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=_NT_DIMS,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    return (lambda x: x), (lambda x: x), dotf, dotnt


def block_embed(mr, mi):
    """Real [2D,2D] embedding of the complex matrix M = mr + i mi acting on
    stacked [xr; xi] columns (traced JAX, outside the kernels)."""
    top = jnp.concatenate([mr, -mi], axis=1)
    bot = jnp.concatenate([mi, mr], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def supports_block(cfg: CMPSConfig) -> bool:
    """Block layout needs 2D sublanes to tile (D % 4 == 0)."""
    return cfg.bond_dim % 4 == 0


def _psi_block_constants(cc):
    """(Ab, Bb, Rb) with the conj(p) rotation folded in: C~ = C diag(conj p),
    R~ = R diag(conj p); Rb is the bare expectation operator."""
    pc, ps = cc.p_c, cc.p_s
    ctr = cc.Cr * pc[None, :] + cc.Ci * ps[None, :]
    cti = cc.Ci * pc[None, :] - cc.Cr * ps[None, :]
    rtr = cc.Rr * pc[None, :] + cc.Ri * ps[None, :]
    rti = cc.Ri * pc[None, :] - cc.Rr * ps[None, :]
    return (block_embed(ctr, cti), block_embed(rtr, rti),
            block_embed(cc.Rr, cc.Ri))


def _psi_block_t0(cc, pr0, pi0):
    """Stacked kernel-frame initial state t0 = p .* x0 ([2D, B])."""
    pc, ps = cc.p_c[:, None], cc.p_s[:, None]
    t0r = pr0 * pc - pi0 * ps
    t0i = pi0 * pc + pr0 * ps
    return jnp.concatenate([t0r, t0i], axis=0)


def _rho_block_constants(cc):
    """(Ab, Bb, Xb) with the diag(p) rotation folded in:
    A~ = conj(C) diag(p), B~ = conj(R) diag(p); Xb embeds X^T."""
    pc, ps = cc.p_c, cc.p_s
    atr = cc.Cr * pc[None, :] + cc.Ci * ps[None, :]
    ati = cc.Cr * ps[None, :] - cc.Ci * pc[None, :]
    btr = cc.Rr * pc[None, :] + cc.Ri * ps[None, :]
    bti = cc.Rr * ps[None, :] - cc.Ri * pc[None, :]
    return (block_embed(atr, ati), block_embed(btr, bti),
            block_embed(cc.Xr.T, cc.Xi.T))


# one home for the rho initial-factor/segment construction (shared with
# the split kernels)
_rho_factor_inputs = rho_factor_inputs


def _rho_block_t0(cc, h0r, h0i):
    """Stacked kernel-frame initial factor t0 = conj(p) .* H0 ([2D, BR])."""
    pc, ps = cc.p_c[:, None], cc.p_s[:, None]
    t0r = h0r * pc + h0i * ps
    t0i = h0i * pc - h0r * ps
    return jnp.concatenate([t0r, t0i], axis=0)


# ===========================================================================
# psi kernels
# ===========================================================================

def _psi_step(ab, bb, rb, t, s, log_eps, norm_eps, prep, dotf):
    """One stacked forward step; y/ru/ty are [2D, B]. ab/bb/rb arrive
    prepped (see _make_dot_ops)."""
    tp = prep(t)
    bt = dotf(bb, tp)                               # R~ t
    y = dotf(ab, tp) + s * bt                       # y = C~ t + s R~ t
    ru = dotf(rb, prep(y))                          # R y (expectation)
    e = 2.0 * jnp.sum(y * ru, axis=0, keepdims=True)
    arg = jnp.maximum(1.0 + e * s, log_eps)
    n2 = jnp.sum(y * y, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
    ty = y * inv
    return dict(bt=bt, y=y, ru=ru, e=e, arg=arg, n2=n2, inv=inv, ty=ty)


def _psi_step_defer(ab, bb, rb, t, n2p, s, log_eps, norm_eps, prep, dotf):
    """Deferred-normalization step: state stays unnormalized in-block,
    e = ehat / n2_prev (exactly the normalized value)."""
    tp = prep(t)
    bt = dotf(bb, tp)
    y = dotf(ab, tp) + s * bt
    ru = dotf(rb, prep(y))
    ehat = 2.0 * jnp.sum(y * ru, axis=0, keepdims=True)
    n2p_c = jnp.maximum(n2p, norm_eps)
    e = ehat / n2p_c
    arg = jnp.maximum(1.0 + e * s, log_eps)
    n2 = jnp.sum(y * y, axis=0, keepdims=True)
    return dict(bt=bt, y=y, ru=ru, e=e, arg=arg, n2=n2)


def _make_psi_fwd_kernel_batched(cfg: CMPSConfig, unroll: int,
                                 precision: str):
    """Deferred-normalization forward with the SEQUENTIAL SPINE / BATCHED
    LIMBS split (round 3): the only latency-bound per-step work is the
    state recurrence y = C~ t + s R~ t (2 dots sharing one prepped
    operand); the expectation matvec R y — which feeds ONLY the loss in
    defer mode — is hoisted out of the chain and computed for the whole
    unrolled block as ONE wide [2D,2D]@[2D,K*B] GEMM over the states
    stored in a VMEM scratch. Halves the latency-bound MXU dispatches per
    step; the batched GEMM runs at full lane throughput.

    Requires the per-step lane count to be a multiple of 128 (static lane
    slices of the batch scratch); the factory gates on it."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, _, dotf, _ = _make_dot_ops_bwd(precision)
    K = unroll

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, rb_ref,
               loss_ref, ck_ref, t_s, acc_s, ys_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        t = t_s[:]
        B = t.shape[1]
        ck_ref[0] = t
        # --- sequential spine: state chain only
        tp = prep(t)
        n2s, ss = [], []
        for k in range(K):
            s = se_ref[0, k:k + 1, :]
            y = dotf(ab, tp) + s * dotf(bb, tp)
            tp = prep(y)
            ys_s[:, k * B:(k + 1) * B] = y
            n2s.append(jnp.sum(y * y, axis=0, keepdims=True))
            ss.append(s)
            t = y
        # --- batched loss limb: one wide GEMM for all K expectations
        ys = ys_s[:]
        ru_all = dotf(rb, prep(ys))
        ehat_lane = 2.0 * jnp.sum(ys * ru_all, axis=0, keepdims=True)
        acc = acc_s[:]
        n2p = jnp.ones_like(acc)
        for k in range(K):
            ehat = ehat_lane[:, k * B:(k + 1) * B]
            e = ehat / jnp.maximum(n2p, norm_eps)
            arg = jnp.maximum(1.0 + e * ss[k], log_eps)
            acc = acc - jnp.log(arg)
            n2p = n2s[k]
        inv = jax.lax.rsqrt(jnp.maximum(n2p, norm_eps))
        t_s[:] = t * inv
        acc_s[:] = acc
        loss_ref[0] = acc

    return kernel


def _make_psi_bwd_kernel_batched(cfg: CMPSConfig, unroll: int,
                                 n_blocks: int, precision: str):
    """Deferred-normalization adjoint, spine/limbs split (see the batched
    forward): the reverse recurrence keeps only dy -> (C~^T dy, R~^T dy);
    everything else — the R y matvecs, their adjoints rbT @ dru, and ALL
    parameter cotangents (one lane-contraction per parameter over the
    whole block) — runs as per-block wide GEMMs over VMEM state buffers.
    The per-step loss scalars (e, arg, de, dn2) are forward-computable in
    defer mode, so the c_k = 2 y dn2 + 2 dehat ru + rbT dru contributions
    are precomputed and the spine is dy_k = dt_k + c_k."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr = _make_dot_ops(precision)
    K = unroll

    def kernel(se_ref, g_ref, ck_ref, ab_ref, bb_ref, rb_ref,
               dse_ref, dab_ref, dbb_ref, drb_ref, dt0_ref,
               dt_s, aab_s, abb_s, arb_s, st_s, pu_s, dru_s, dy_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, arb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        abT, bbT, rbT = tr(ab), tr(bb), tr(rb)

        # --- recompute spine (identical arithmetic to the forward)
        t = ck_ref[0]
        B = t.shape[1]
        st_s[:, 0:B] = t
        tp = prep(t)
        n2s, ss = [], []
        for k in range(K):
            s = se_ref[0, k:k + 1, :]
            pu_s[:, k * B:(k + 1) * B] = s * t
            y = dotf(ab, tp) + s * dotf(bb, tp)
            tp = prep(y)
            st_s[:, (k + 1) * B:(k + 2) * B] = y
            n2s.append(jnp.sum(y * y, axis=0, keepdims=True))
            ss.append(s)
            t = y
        # --- batched forward tail
        ys = st_s[:, B:(K + 1) * B]
        pys = prep(ys)
        ru_all = dotf(rb, pys)
        ehat_lane = 2.0 * jnp.sum(ys * ru_all, axis=0, keepdims=True)
        n2ps = [jnp.ones_like(n2s[0])] + n2s[:-1]

        # --- block-exit renormalization adjoint seeds
        dt_in = dt_s[:]
        n2K = n2s[-1]
        inv = jax.lax.rsqrt(jnp.maximum(n2K, norm_eps))
        dt = dt_in * inv
        dinv = jnp.sum(dt_in * t, axis=0, keepdims=True)
        dn2_exit = jnp.where(n2K > norm_eps,
                             -0.5 * dinv * inv * inv * inv,
                             jnp.zeros_like(dinv))

        # --- batched reverse precompute (all forward-computable)
        es, dargs, dehats, dn2_from_e = [], [], [], []
        for k in range(K):
            n2p_c = jnp.maximum(n2ps[k], norm_eps)
            e = ehat_lane[:, k * B:(k + 1) * B] / n2p_c
            arg = jnp.maximum(1.0 + e * ss[k], log_eps)
            darg = jnp.where(arg > log_eps,
                             -g_ref[:] / arg, jnp.zeros_like(arg))
            de = darg * ss[k]
            dehat = de / n2p_c
            dn2_from_e.append(jnp.where(n2ps[k] > norm_eps,
                                        -de * e / n2p_c,
                                        jnp.zeros_like(de)))
            es.append(e)
            dargs.append(darg)
            dehats.append(dehat)
            y = st_s[:, (k + 1) * B:(k + 2) * B]
            dru_s[:, k * B:(k + 1) * B] = 2.0 * dehat * y
        pdru_all = prep(dru_s[:])
        rbtdru_all = dotf(rbT, pdru_all)

        # --- sequential reverse spine: dy -> (abT dy, bbT dy) only
        for k in reversed(range(K)):
            # dn2 used at step k = the cotangent of n2_k: from step k+1's
            # e-division, or the block-exit renorm for the last step
            dn2_k = dn2_from_e[k + 1] if k < K - 1 else dn2_exit
            y = st_s[:, (k + 1) * B:(k + 2) * B]
            c = (2.0 * y * dn2_k
                 + 2.0 * dehats[k] * ru_all[:, k * B:(k + 1) * B]
                 + rbtdru_all[:, k * B:(k + 1) * B])
            dy = dt + c
            dy_s[:, k * B:(k + 1) * B] = dy
            pdy = prep(dy)
            du = dotf(bbT, pdy)
            dtn = dotf(abT, pdy) + ss[k] * du
            t_k = st_s[:, k * B:(k + 1) * B]
            ds = (dargs[k] * es[k]
                  + jnp.sum(du * t_k, axis=0, keepdims=True))
            dse_ref[0, k:k + 1, :] = ds
            dt = dtn

        # --- batched parameter cotangents: one lane-contraction each
        pdy_all = prep(dy_s[:])
        d_rb = dotnt(pdru_all, pys)
        d_ab = dotnt(pdy_all, prep(st_s[:, 0:K * B]))
        d_bb = dotnt(pdy_all, prep(pu_s[:]))

        dt_s[:] = dt
        aab_s[:] = aab_s[:] + d_ab
        abb_s[:] = abb_s[:] + d_bb
        arb_s[:] = arb_s[:] + d_rb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            drb_ref[:] = arb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


def _make_psi_fwd_kernel(cfg: CMPSConfig, unroll: int,
                         precision: str, defer_norm: bool):
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, rb_ref,
               loss_ref, ck_ref, t_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        t = t_s[:]
        ck_ref[0] = t            # block-entry checkpoint (normalized)
        acc = acc_s[:]
        if defer_norm:
            # deferred chain is t_{k+1} = y_k, so each step's state prep
            # is the previous step's prep(y): ONE fresh split per step.
            # HAND-PIPELINED (r3 probe: -6-10% on v5e): the loss tail of
            # step k is emitted AFTER step k+1's state dots, giving the
            # mostly-in-order Mosaic schedule independent MXU work to
            # overlap the latency-serialized state chain with. Identical
            # arithmetic, pure reordering.
            def loss_tail(acc, pend):
                y0, py0, s0, n2p0 = pend
                ru0 = dotf(rb, py0)
                ehat0 = 2.0 * jnp.sum(y0 * ru0, axis=0, keepdims=True)
                e0 = ehat0 / jnp.maximum(n2p0, norm_eps)
                # no padding gates: padded rows have s=0, so arg == 1
                # (zero loss term) and zero cotangents — see module doc
                return acc - jnp.log(jnp.maximum(1.0 + e0 * s0, log_eps))

            n2p = jnp.ones_like(acc)
            tp = prep(t)
            pend = None
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                bt = dotf(bb, tp)
                y = dotf(ab, tp) + s * bt
                tp = prep(y)
                if pend is not None:
                    acc = loss_tail(acc, pend)
                pend = (y, tp, s, n2p)
                t = y
                n2p = jnp.sum(y * y, axis=0, keepdims=True)
            acc = loss_tail(acc, pend)
            inv = jax.lax.rsqrt(jnp.maximum(n2p, norm_eps))
            t = t * inv          # block-exit renormalization
        else:
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _psi_step(ab, bb, rb, t, s, log_eps, norm_eps, prep,
                              dotf)
                acc = acc - jnp.log(f["arg"])
                t = f["ty"]

        t_s[:] = t
        acc_s[:] = acc
        loss_ref[0] = acc

    return kernel


def _make_psi_bwd_kernel(cfg: CMPSConfig, unroll: int,
                         n_blocks: int, precision: str):
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, tr = _make_dot_ops(precision)

    def kernel(se_ref, g_ref, ck_ref, ab_ref, bb_ref, rb_ref,
               dse_ref, dab_ref, dbb_ref, drb_ref, dt0_ref,
               dt_s, aab_s, abb_s, arb_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, arb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        abT, bbT, rbT = tr(ab), tr(bb), tr(rb)

        # --- recompute the block from its checkpoint, keeping GEMM products
        t = ck_ref[0]
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _psi_step(ab, bb, rb, t, s, log_eps, norm_eps, prep, dotf)
            saved.append((t, f["bt"], f["y"], f["ru"]))
            t = f["ty"]

        # --- reverse sweep
        dt = dt_s[:]
        a_ab, a_bb, a_rb = aab_s[:], abb_s[:], arb_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            tin, bt, y, ru = saved[k]
            # cheap scalar tail recompute (VPU only)
            e = 2.0 * jnp.sum(y * ru, axis=0, keepdims=True)
            arg = jnp.maximum(1.0 + e * s, log_eps)
            n2 = jnp.sum(y * y, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))

            # normalize adjoint: ty = y * inv
            dy = dt * inv
            dinv = jnp.sum(dt * y, axis=0, keepdims=True)
            dn2 = jnp.where(n2 > norm_eps,
                            -0.5 * dinv * inv * inv * inv,
                            jnp.zeros_like(dinv))
            dy = dy + 2.0 * y * dn2
            # loss adjoint (per-lane weighted by the loss cotangent g)
            darg = jnp.where(arg > log_eps,
                             -g_ref[:] / arg, jnp.zeros_like(arg))
            de = darg * s
            ds = darg * e
            # e = 2 sum(y . ru)
            dy = dy + 2.0 * de * ru
            dru = 2.0 * de * y
            # ru = Rb y adjoint (also accumulates dRb)
            pdru = prep(dru)
            dy = dy + dotf(rbT, pdru)
            d_rb = dotf(pdru, prep(y.T))
            # y = Ab t + s * (Bb t)
            ds = ds + jnp.sum(dy * bt, axis=0, keepdims=True)
            sdy = s * dy
            pdy, psdy = prep(dy), prep(sdy)
            dtn = dotf(abT, pdy) + dotf(bbT, psdy)
            ptinT = prep(tin.T)
            d_ab = dotf(pdy, ptinT)
            d_bb = dotf(psdy, ptinT)

            # padded steps carry dt == 0 -> all their cotangents vanish;
            # padded dse rows are sliced off by autodiff outside
            dse_ref[0, k:k + 1, :] = ds
            dt = dtn
            a_ab = a_ab + d_ab
            a_bb = a_bb + d_bb
            a_rb = a_rb + d_rb

        dt_s[:] = dt
        aab_s[:] = a_ab
        abb_s[:] = a_bb
        arb_s[:] = a_rb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            drb_ref[:] = arb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


def _make_psi_bwd_kernel_defer(cfg: CMPSConfig, unroll: int,
                               n_blocks: int, precision: str):
    """Deferred-normalization adjoint: no per-step normalize adjoint; the
    squared-norm cotangent dn2 is carried alongside dt (see the split
    kernel, ops/pallas_grad.py:_make_psi_bwd_kernel_defer).

    RESTRUCTURED reverse sweep (round 3, VERDICT item 1 — the bf16x3
    wide-operand overhead):
      - the block recompute phrases the update as y = Ab t + Bb u with
        u = s .* t (the per-lane signal scale commutes into the operand),
        and SAVES the prepped (split) forms tp/pu/py — in defer mode
        t_{k+1} = y_k, so each step's tp is the previous step's py and the
        whole recompute costs 2 fresh preps/step;
      - the reverse sweep reuses those saved preps: parameter cotangents
        are lane-contraction `dot_general`s (d_ab = dy @ t^T via dotnt —
        no materialized transposes), d_bb = dy @ u^T replaces the old
        (s*dy) @ t^T (identical contraction, one fewer prep), and
        du = Bb^T dy serves both the state cotangent (dtn += s .* du) and
        ds (sum(du . t)). 2 preps + 0 transposes per reverse step vs the
        old 5 preps + 2 transposes, at identical MXU pass counts.
    """
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr = _make_dot_ops(precision)

    def kernel(se_ref, g_ref, ck_ref, ab_ref, bb_ref, rb_ref,
               dse_ref, dab_ref, dbb_ref, drb_ref, dt0_ref,
               dt_s, aab_s, abb_s, arb_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, arb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        abT, bbT, rbT = tr(ab), tr(bb), tr(rb)

        # --- recompute the unnormalized chain from the checkpoint,
        # saving the PREPPED operands for the reverse sweep
        # (bwd-side hand-pipelining was measured a small LOSS for bf16x3
        # on v5e — extra live split pairs — so only the forward kernels
        # reorder; see CLAUDE.md r3 notes)
        t = ck_ref[0]
        tp = prep(t)
        n2p = jnp.ones_like(se_ref[0, 0:1, :])
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            pu = prep(s * t)
            y = dotf(ab, tp) + dotf(bb, pu)       # Ab t + Bb (s t)
            py = prep(y)
            saved.append((tp, pu, py, dotf(rb, py), n2p))
            t = y                                  # defer: t_{k+1} = y_k
            tp = py                                # ... so its prep too
            n2p = jnp.sum(y * y, axis=0, keepdims=True)

        # --- block-exit renormalization adjoint seeds (dt, dn2)
        dt_in = dt_s[:]
        inv = jax.lax.rsqrt(jnp.maximum(n2p, norm_eps))
        dt = dt_in * inv
        dinv = jnp.sum(dt_in * t, axis=0, keepdims=True)
        dn2 = jnp.where(n2p > norm_eps,
                        -0.5 * dinv * inv * inv * inv,
                        jnp.zeros_like(dinv))

        a_ab, a_bb, a_rb = aab_s[:], abb_s[:], arb_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            tp_k, pu_k, py_k, ru, n2pk = saved[k]
            t_k = rec(tp_k)
            y = rec(py_k)
            # cheap scalar tail recompute (VPU only)
            ehat = 2.0 * jnp.sum(y * ru, axis=0, keepdims=True)
            n2p_c = jnp.maximum(n2pk, norm_eps)
            e = ehat / n2p_c
            arg = jnp.maximum(1.0 + e * s, log_eps)

            # n2 = sum(y.y) adjoint (dn2 carried from the NEXT step's
            # e-division / the block-exit renorm)
            dy = dt + 2.0 * y * dn2
            # loss adjoint: arg = max(1 + e*s, eps); e = ehat / n2_prev
            darg = jnp.where(arg > log_eps,
                             -g_ref[:] / arg, jnp.zeros_like(arg))
            de = darg * s
            ds = darg * e
            dehat = de / n2p_c
            dn2_new = jnp.where(n2pk > norm_eps,
                                -de * e / n2p_c, jnp.zeros_like(de))
            # ehat = 2 sum(y . ru)
            dy = dy + 2.0 * dehat * ru
            dru = 2.0 * dehat * y
            # ru = Rb y adjoint
            pdru = prep(dru)
            dy = dy + dotf(rbT, pdru)
            # y = Ab t + Bb u, u = s .* t
            pdy = prep(dy)
            du = dotf(bbT, pdy)                    # Bb^T dy
            dtn = dotf(abT, pdy) + s * du          # s commutes per lane
            ds = ds + jnp.sum(du * t_k, axis=0, keepdims=True)
            a_rb = a_rb + dotnt(pdru, py_k)        # dru @ y^T
            a_ab = a_ab + dotnt(pdy, tp_k)         # dy @ t^T
            a_bb = a_bb + dotnt(pdy, pu_k)         # dy @ u^T = (s dy) t^T

            dse_ref[0, k:k + 1, :] = ds
            dt = dtn
            dn2 = dn2_new
        # leftover dn2 sits on the block-entry norm (a constant 1): discard

        dt_s[:] = dt
        aab_s[:] = a_ab
        abb_s[:] = a_bb
        arb_s[:] = a_rb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            drb_ref[:] = arb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


# Streamed-states kernels write the full fp32 state trajectory to HBM
# ([t_pad, 2D, B] = 8*D*B bytes/step). Budget keeps the stream + its
# double-buffering comfortably inside v5e's 16 GB HBM alongside params,
# opt state, and the batch (B=1024 T=16k D=64 would need 8.6 GB - gated
# off; B<=512 streams).
STREAM_HBM_LIMIT = 6 * 1024 ** 3


def auto_stream(cfg: CMPSConfig, cols: int, T: int, defer_norm: bool,
                interpret: bool) -> bool:
    """Resolve stream=None: ON on real TPU whenever the streamed-states
    kernels are supported (defer-norm block path, lane-aligned columns —
    B for psi, B*rank for rho) and the state stream fits the HBM budget.
    Measured on v5e (D=64/128, B=128, T=16384): 1.25-1.34x over the defer
    kernels at both precisions — the backward's serial recompute chain is
    replaced by batched GEMMs over the streamed states. OFF under
    interpret (CPU tests exercise it explicitly; small-column TPU configs
    keep the non-streamed path).

    ``cfg.kernel_stream`` overrides: "off" never streams; "on" forces it
    wherever structurally supported (raising where it is not), skipping
    the HBM budget — oversubscribed streams can page catastrophically."""
    mode = cfg.kernel_stream
    if mode == "off":
        return False
    if mode == "on":
        if not defer_norm:
            raise ValueError(
                "kernel_stream='on' requires defer_norm=True (the "
                "streamed kernels implement the deferred-normalization "
                "path only)")
        if not interpret and cols % 128 != 0:
            raise ValueError(
                f"kernel_stream='on' needs tile-aligned lanes on TPU "
                f"(columns % 128 == 0 — B for psi, B*rank for rho), got "
                f"{cols}")
        return True
    if not defer_norm or interpret:
        return False
    if cols % 128 != 0:
        return False
    return 8 * cfg.bond_dim * cols * T <= STREAM_HBM_LIMIT


def auto_pad_cols(cfg: CMPSConfig, B: int, T: int, defer_norm: bool,
                  interpret: bool) -> int:
    """Resolve the PSI kernel lane count, padding B up to the next
    multiple of 128 where that is measured faster (PSIBATCH_r04.json).

    A [2D, B] operand with B < 128 is hardware-padded to a full lane
    tile anyway, so the padded kernel executes the SAME MXU passes —
    but tile-aligned lanes unlock the streamed-states kernels, whose
    backward drops the serial recompute chain. Measured at D=128
    T=16384: B=64 non-streamed 117.4/59.8 ms (fp32/bf16x3) vs the same
    data padded to 128 streamed 90.9/48.3 ms — the padded step is
    FASTER IN ABSOLUTE TIME despite computing dummy lanes. Dummy lanes
    are zero signals from a zero state; the per-example loss rows are
    sliced back to B, so values and gradients are exact (dummy-lane
    cotangents are structurally zero).

    ``cfg.kernel_pad_lanes``: "off" never pads; "on" always pads to the
    next 128 multiple (works under interpret too — CPU tests exercise
    the padded path); "auto" pads on real TPU when the padded shape
    would stream within the HBM budget and still fit the fused-backward
    VMEM ceiling."""
    mode = cfg.kernel_pad_lanes
    if mode == "off" or B % 128 == 0:
        return B
    Bp = -(-B // 128) * 128
    if mode == "on":
        return Bp
    if interpret or not defer_norm:
        return B
    from .pallas_grad import fused_supported
    if not fused_supported(cfg, Bp, rank=1):
        return B
    if not auto_stream(cfg, Bp, T, defer_norm, interpret):
        # the padding win IS the streamed-kernel unlock; without it the
        # padded step executes the same passes plus dummy-lane VPU work
        return B
    return Bp


def auto_pad_rank(cfg: CMPSConfig, B: int, rank: int, T: int,
                  defer_norm: bool, interpret: bool) -> int:
    """RHO-family lane padding: pad the purification RANK with zero
    factor rows so B*rank reaches the next multiple of 128 (the psi
    rationale of auto_pad_cols, applied to the rank dimension — zero
    rows are exactly zero through the linear factor update, so every
    per-example trace/expectation segment sum is unchanged and the
    per-example loss shape doesn't move at all).

    defer_norm only (the non-defer backward folds a 1/(B*rank) weight
    that padding would skew); same policy as psi otherwise: "off" never,
    "on" always (where defer_norm), "auto" when the padded shape streams
    within the HBM budget and fits the fused-backward VMEM ceiling."""
    mode = cfg.kernel_pad_lanes
    cols = B * rank
    if mode == "off" or cols % 128 == 0 or not defer_norm:
        return rank
    m = 128 // math.gcd(B, 128)
    rank_p = -(-rank // m) * m
    if mode == "on":
        return rank_p
    if interpret:
        return rank
    if -(-B * rank_p // 128) != -(-B * rank // 128):
        # the uniform per-example pad overshoots the 128-lane tile
        # ceiling (non-power-of-2 B): real extra MXU passes, not
        # hardware-padded-anyway lanes — auto declines, "on" forces.
        # EXCEPT inside the measured win envelope (r5 boundary sweep,
        # PADRANK_r05.json: full train step B=12 rank=8 T=16385 bf16x3):
        # at D <= 8 the [2D,2D] dots are so small that the extra tiles
        # cost less than the stream/alignment unlock buys — forced pad
        # 0.885x at D=8, a LOSS from D=16 up (1.047 -> 1.536 at D=64).
        # The envelope is bounded at the measured 3 padded tiles: an
        # unbounded exception would auto-force e.g. B=67 r=8 from 5 to
        # 67 tiles (13x the passes) on an unmeasured premise.
        if not (cfg.bond_dim <= 8 and B * rank_p <= 3 * 128):
            return rank
    from .pallas_grad import fused_supported
    if not fused_supported(cfg, B, rank_p):
        return rank
    if not auto_stream(cfg, B * rank_p, T, defer_norm, interpret):
        return rank
    return rank_p


def _make_psi_fwd_kernel_stream(cfg: CMPSConfig, unroll: int,
                                precision: str):
    """Deferred-normalization forward that STREAMS every post-step state
    y_k to HBM (extra [1, 2D, K*B] output block per grid step) so the
    backward can replace its serial recompute chain with batched GEMMs
    (see _make_psi_bwd_kernel_stream). Same arithmetic as
    _make_psi_fwd_kernel(defer_norm=True), including the r3
    hand-pipelined loss tail; the store is one static lane slice per
    step, off the dependent-dot path."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, rb_ref,
               loss_ref, ck_ref, ys_ref, t_s, acc_s):
        B = se_ref.shape[2]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        t = t_s[:]
        ck_ref[0] = t            # block-entry checkpoint (normalized)
        acc = acc_s[:]

        def loss_tail(acc, pend):
            y0, py0, s0, n2p0 = pend
            ru0 = dotf(rb, py0)
            ehat0 = 2.0 * jnp.sum(y0 * ru0, axis=0, keepdims=True)
            e0 = ehat0 / jnp.maximum(n2p0, norm_eps)
            return acc - jnp.log(jnp.maximum(1.0 + e0 * s0, log_eps))

        n2p = jnp.ones_like(acc)
        tp = prep(t)
        pend = None
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            bt = dotf(bb, tp)
            y = dotf(ab, tp) + s * bt
            ys_ref[0, :, k * B:(k + 1) * B] = y
            tp = prep(y)
            if pend is not None:
                acc = loss_tail(acc, pend)
            pend = (y, tp, s, n2p)
            t = y
            n2p = jnp.sum(y * y, axis=0, keepdims=True)
        acc = loss_tail(acc, pend)
        inv = jax.lax.rsqrt(jnp.maximum(n2p, norm_eps))
        t = t * inv              # block-exit renormalization

        t_s[:] = t
        acc_s[:] = acc
        loss_ref[0] = acc

    return kernel


def _make_psi_bwd_kernel_stream(cfg: CMPSConfig, unroll: int,
                                n_blocks: int, precision: str):
    """STREAMED-STATES adjoint (round 4, VERDICT item 1 follow-through).

    probe8 attributed the psi full-step floor to the BACKWARD's two
    latency-serialized dot chains (recompute + adjoint) — the forward's
    own chain is ~0.5 us/step and its loss tail is free. This kernel
    removes the recompute chain entirely: the forward streamed every
    unnormalized state y_k to HBM, so everything the defer adjoint
    recomputed serially is rebuilt here as full-block BATCHED work —
      * RU = Rb @ [y_0..y_{K-1}] is ONE [2D,2D]@[2D,K*B] GEMM,
      * the e / arg / darg / dn2 scalar tail is full-lane VPU algebra,
      * dru and its rbT GEMM batch the same way, and the chain-
        independent part of every dy (C_k) is precomputed, so
      * the ONLY serial work left is the true adjoint recurrence
        dt_k <- abT @ pdy + s .* (bbT @ pdy) — 2 dependent dots/step,
        the same depth as the forward chain;
      * parameter cotangents batch as THREE lane-contraction dot_generals
        over the whole block (dy/dru stored to VMEM scratch during the
        chain), replacing 3K in-order accumulation GEMMs.
    dn2 bookkeeping matches _make_psi_bwd_kernel_defer exactly: the dn2
    consumed at step k is step k+1's dn2_new (chain-independent), the
    block-exit renorm seeds the last slice, and the leftover block-entry
    dn2 is discarded."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr = _make_dot_ops(precision)
    K = unroll
    split = precision == "high"

    def kernel(se_ref, g_ref, ck_ref, ys_ref, ab_ref, bb_ref, rb_ref,
               dse_ref, dab_ref, dbb_ref, drb_ref, dt0_ref,
               dt_s, aab_s, abb_s, arb_s, ts_s, sf_s, gf_s, n2p_s,
               dn2_s, *pdy_s):
        B = se_ref.shape[2]
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, arb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, rb = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        abT, bbT, rbT = tr(ab), tr(bb), tr(rb)
        ys = ys_ref[0]                         # [2D, K*B] streamed states
        g = g_ref[:]                           # [1, B]

        # --- batched recompute (no serial chain): lane-assemble the
        # shifted state/signal/cotangent rows, then full-lane algebra
        ts_s[:, 0:B] = ck_ref[0]               # t_k = y_{k-1}; t_0 = ck
        if K > 1:
            ts_s[:, B:] = ys[:, :(K - 1) * B]
        for k in range(K):
            sf_s[:, k * B:(k + 1) * B] = se_ref[0, k:k + 1, :]
            gf_s[:, k * B:(k + 1) * B] = g
        tfull = ts_s[:]
        sfull = sf_s[:]
        gfull = gf_s[:]
        PY = prep(ys)
        TP = prep(tfull)
        RU = dotf(rb, PY)
        n2y = jnp.sum(ys * ys, axis=0, keepdims=True)
        ehat = 2.0 * jnp.sum(ys * RU, axis=0, keepdims=True)
        n2p_s[:, 0:B] = jnp.ones_like(g)       # n2p_k = |y_{k-1}|^2; 1 at k=0
        if K > 1:
            n2p_s[:, B:] = n2y[:, :(K - 1) * B]
        n2p = n2p_s[:]
        n2p_c = jnp.maximum(n2p, norm_eps)
        e = ehat / n2p_c
        arg = jnp.maximum(1.0 + e * sfull, log_eps)
        darg = jnp.where(arg > log_eps, -gfull / arg, jnp.zeros_like(arg))
        de = darg * sfull
        ds0 = darg * e
        dehat = de / n2p_c
        dn2_new = jnp.where(n2p > norm_eps, -de * e / n2p_c,
                            jnp.zeros_like(de))

        # --- block-exit renormalization adjoint seeds (dt, last dn2)
        dt_in = dt_s[:]
        t_last = ys[:, (K - 1) * B:]
        n2_last = n2y[:, (K - 1) * B:]
        inv = jax.lax.rsqrt(jnp.maximum(n2_last, norm_eps))
        dt = dt_in * inv
        dinv = jnp.sum(dt_in * t_last, axis=0, keepdims=True)
        seed = jnp.where(n2_last > norm_eps,
                         -0.5 * dinv * inv * inv * inv,
                         jnp.zeros_like(dinv))
        if K > 1:
            dn2_s[:, :(K - 1) * B] = dn2_new[:, B:]
        dn2_s[:, (K - 1) * B:] = seed
        dn2at = dn2_s[:]

        DRU = (2.0 * dehat) * ys
        PDRU = prep(DRU)
        RTD = dotf(rbT, PDRU)
        # chain-independent part of every dy
        C = ys * (2.0 * dn2at) + RU * (2.0 * dehat) + RTD

        a_ab, a_bb, a_rb = aab_s[:], abb_s[:], arb_s[:]
        a_rb = a_rb + dotnt(PDRU, PY)          # batched over the block

        # --- serial adjoint chain: 2 dependent dots per step
        for k in reversed(range(K)):
            dy = dt + C[:, k * B:(k + 1) * B]
            pdy = prep(dy)
            if split:
                pdy_s[0][:, k * B:(k + 1) * B] = pdy[0]
                pdy_s[1][:, k * B:(k + 1) * B] = pdy[1]
            else:
                pdy_s[0][:, k * B:(k + 1) * B] = pdy
            du = dotf(bbT, pdy)
            s = se_ref[0, k:k + 1, :]
            dtn = dotf(abT, pdy) + s * du
            tk = tfull[:, k * B:(k + 1) * B]
            ds = (ds0[:, k * B:(k + 1) * B]
                  + jnp.sum(du * tk, axis=0, keepdims=True))
            dse_ref[0, k:k + 1, :] = ds
            dt = dtn
        # leftover dn2 sits on the block-entry norm (a constant 1): discard

        # --- batched parameter-cotangent accumulations
        PDY = (pdy_s[0][:], pdy_s[1][:]) if split else pdy_s[0][:]
        U = sfull * tfull
        a_ab = a_ab + dotnt(PDY, TP)
        a_bb = a_bb + dotnt(PDY, prep(U))

        dt_s[:] = dt
        aab_s[:] = a_ab
        abb_s[:] = a_bb
        arb_s[:] = a_rb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            drb_ref[:] = arb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


@functools.lru_cache(maxsize=64)
def _psi_block_factory(cfg: CMPSConfig, B: int, T: int, unroll: int,
                       interpret: bool, precision: str, defer_norm: bool,
                       batched: Optional[bool] = None,
                       stream: bool = False):
    """Custom-VJP fused NLL over block constants. The primal returns
    PER-EXAMPLE losses [B]; the VJP takes the matching [B] cotangent.

    `batched` selects the spine/limbs-split kernels
    (_make_psi_*_kernel_batched; requires defer_norm and, on real TPU,
    B % 128 == 0 for the state buffers' static lane slices). Default OFF
    for psi — measured NOT a win on v5e (see the comment at the
    selection); tests pass batched=True with interpret=True to keep the
    variant pinned.

    `stream` selects the streamed-states kernels (_make_psi_*_kernel_stream;
    defer_norm only, same B % 128 TPU gate): the forward streams every
    per-step state to HBM ([t_pad, 2D, B] fp32, i.e. 8*D*B bytes/step) and
    the backward trades its serial recompute chain for batched GEMMs over
    the stored states."""
    D = cfg.bond_dim
    D2 = 2 * D
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll
    if batched is None:
        # Measured on v5e (D=64, B=128, T=16384): the psi spine/limbs
        # split is NOT a win — 30.9 vs 29.7 ms bf16x3, ~parity fp32 —
        # because psi has no segment reductions to batch and its loss-path
        # dots already overlap the spine; the VMEM state-buffer round
        # trips cost more than the saved dispatches. Default OFF for psi
        # (the rho factory, whose skinny seg dots DO batch, defaults ON).
        batched = False
    if batched and not defer_norm:
        raise ValueError("batched kernels implement the deferred-"
                         "normalization semantics only")
    if batched and not interpret and B % 128 != 0:
        raise ValueError(
            f"batched psi kernels need B % 128 == 0 on TPU (static lane "
            f"slices of the VMEM state buffers must be tile-aligned), "
            f"got B={B}")
    if stream and batched:
        raise ValueError("stream and batched kernels are mutually "
                         "exclusive")
    if stream and not defer_norm:
        raise ValueError("streamed-states kernels implement the deferred-"
                         "normalization semantics only")
    if stream and not interpret and B % 128 != 0:
        raise ValueError(
            f"streamed psi kernels need B % 128 == 0 on TPU (static lane "
            f"slices of the state stream must be tile-aligned), got B={B}")

    if stream:
        fwd_kernel = _make_psi_fwd_kernel_stream(cfg, unroll, precision)
        bwd_kernel = _make_psi_bwd_kernel_stream(cfg, unroll, n_blocks,
                                                 precision)
    elif batched:
        fwd_kernel = _make_psi_fwd_kernel_batched(cfg, unroll, precision)
        bwd_kernel = _make_psi_bwd_kernel_batched(cfg, unroll, n_blocks,
                                                  precision)
    else:
        fwd_kernel = _make_psi_fwd_kernel(cfg, unroll, precision,
                                          defer_norm)
        bwd_kernel = (_make_psi_bwd_kernel_defer(cfg, unroll, n_blocks,
                                                 precision) if defer_norm
                      else _make_psi_bwd_kernel(cfg, unroll, n_blocks,
                                                precision))
    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)
    sem_bwd = sem

    def run_fwd(ab, bb, rb, t0, se):
        se3 = se.reshape(n_blocks, unroll, B)
        scratch = [
            pltpu.VMEM((D2, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ]
        if batched:
            scratch.append(pltpu.VMEM((D2, unroll * B), jnp.float32))
        out_specs = [
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D2, B), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, D2, B), jnp.float32),
        ]
        if stream:
            out_specs.append(
                pl.BlockSpec((1, D2, unroll * B), lambda i: (i, 0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((n_blocks, D2, unroll * B),
                                     jnp.float32))
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
                _full((D2, B)),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=sem,
            interpret=interpret,
        )(se3, t0, ab, bb, rb)
        loss, ck = outs[0], outs[1]
        return (loss[-1, 0], ck) + ((outs[2],) if stream else ())

    def run_bwd(ab, bb, rb, se, ck, g, ys=None):
        rev3 = lambda i: (n_blocks - 1 - i, 0, 0)
        se3 = se.reshape(n_blocks, unroll, B)
        scratch = [
            pltpu.VMEM((D2, B), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
        ]
        if batched:
            scratch += [
                pltpu.VMEM((D2, (unroll + 1) * B), jnp.float32),  # states
                pltpu.VMEM((D2, unroll * B), jnp.float32),        # s*t
                pltpu.VMEM((D2, unroll * B), jnp.float32),        # dru
                pltpu.VMEM((D2, unroll * B), jnp.float32),        # dy
            ]
        in_specs = [
            pl.BlockSpec((1, unroll, B), rev3),
            _full((1, B)),
            pl.BlockSpec((1, D2, B), rev3),
        ]
        operands = [se3, g, ck]
        if stream:
            KB = unroll * B
            scratch += [
                pltpu.VMEM((D2, KB), jnp.float32),   # ts (shifted states)
                pltpu.VMEM((1, KB), jnp.float32),    # s rows
                pltpu.VMEM((1, KB), jnp.float32),    # g rows
                pltpu.VMEM((1, KB), jnp.float32),    # n2p rows
                pltpu.VMEM((1, KB), jnp.float32),    # dn2-at rows
            ]
            if precision == "high":
                scratch += [pltpu.VMEM((D2, KB), jnp.bfloat16)] * 2
            else:
                scratch += [pltpu.VMEM((D2, KB), jnp.float32)]
            in_specs.append(pl.BlockSpec((1, D2, KB), rev3))
            operands.append(ys)
        in_specs += [_full((D2, D2)), _full((D2, D2)), _full((D2, D2))]
        operands += [ab, bb, rb]
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, unroll, B), rev3),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((D2, B)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, unroll, B), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, D2), jnp.float32),
                jax.ShapeDtypeStruct((D2, B), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=sem_bwd,
            interpret=interpret,
        )(*operands)
        return (outs[0].reshape(t_pad, B),) + tuple(outs[1:])

    @jax.custom_vjp
    def fused(ab, bb, rb, t0, se):
        return run_fwd(ab, bb, rb, t0, se)[0]

    def fused_fwd(ab, bb, rb, t0, se):
        outs = run_fwd(ab, bb, rb, t0, se)
        return outs[0], (ab, bb, rb, se) + tuple(outs[1:])

    def fused_bwd(res, g):
        ab, bb, rb, se, ck = res[:5]
        ys = res[5] if stream else None
        dse, dab, dbb, drb, dt0 = run_bwd(ab, bb, rb, se, ck, g[None, :],
                                          ys)
        return (dab, dbb, drb, dt0, dse)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def psi_nll_block_trainable_from_state(params, cfg: CMPSConfig, signals,
                                       psi0_pair, *,
                                       unroll: Optional[int] = None,
                                       interpret: Optional[bool] = None,
                                       precision: str = "highest",
                                       reduce: str = "mean",
                                       defer_norm: bool = False,
                                       stream: Optional[bool] = None):
    """Block-layout fused NLL with PER-EXAMPLE initial states [B, D]
    (pair); drop-in for pallas_grad.psi_nll_pallas_trainable_from_state.
    ``stream=None`` auto-enables the streamed-states kernels where
    measured faster (see auto_stream)."""
    if reduce not in ("mean", "none"):
        raise ValueError(f"reduce must be 'mean' or 'none', got {reduce!r}")
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"block layout requires bond_dim % 4 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    B, T = signals.shape
    Bp = auto_pad_cols(cfg, B, T, defer_norm, interpret)
    unroll = auto_unroll(2 * cfg.bond_dim, Bp, unroll)
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = _pad_rows(incs, t_pad)
    pr0, pi0 = psi0_pair                              # [B, D]
    ab, bb, rb = _psi_block_constants(cc)
    t0 = _psi_block_t0(cc, pr0.T, pi0.T)
    if Bp != B:
        # dummy lanes: zero signal increments on a zero state — every
        # per-step quantity is finite (norms clamp at norm_eps), the
        # per-example loss rows are sliced back to B below, and the
        # slice's VJP zeroes the dummy-lane cotangents, so values AND
        # gradients are exact (pinned by tests)
        se = jnp.pad(se, ((0, 0), (0, Bp - B)))
        t0 = jnp.pad(t0, ((0, 0), (0, Bp - B)))
    if stream is None:
        stream = auto_stream(cfg, Bp, T, defer_norm, interpret)
    fused = _psi_block_factory(cfg, Bp, T, unroll, interpret, precision,
                               defer_norm, None, stream)
    loss = fused(ab, bb, rb, t0, se)[:B]
    return jnp.mean(loss) if reduce == "mean" else loss


def psi_nll_block_trainable(params, cfg: CMPSConfig, signals, *,
                            unroll: Optional[int] = None,
                            interpret: Optional[bool] = None,
                            precision: str = "highest",
                            defer_norm: bool = False,
                            stream: Optional[bool] = None):
    """Block-layout differentiable fused NLL (semantics of core.psi_nll);
    drop-in for pallas_grad.psi_nll_pallas_trainable. ``stream=None``
    auto-enables the streamed-states kernels where measured faster."""
    B = signals.shape[0]
    pr0, pi0 = core.psi0(params, cfg)
    pair = (jnp.broadcast_to(pr0[None, :], (B, pr0.shape[0])),
            jnp.broadcast_to(pi0[None, :], (B, pi0.shape[0])))
    return psi_nll_block_trainable_from_state(
        params, cfg, signals, pair, unroll=unroll, interpret=interpret,
        precision=precision, reduce="mean", defer_norm=defer_norm,
        stream=stream)


# ===========================================================================
# rho kernels (purification factor, stacked [2D, B*rank])
# ===========================================================================

def _rho_step(ab, bb, xb, seg, t, s, log_eps, norm_eps, prep, dotf):
    tp = prep(t)
    bt = dotf(bb, tp)
    y = dotf(ab, tp) + s * bt
    gx = dotf(xb, prep(y))
    e_bc = seg(jnp.sum(y * gx, axis=0, keepdims=True))
    arg = jnp.maximum(1.0 + e_bc * s, log_eps)
    tr_bc = seg(jnp.sum(y * y, axis=0, keepdims=True))
    inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
    ty = y * inv
    return dict(bt=bt, y=y, gx=gx, e_bc=e_bc, arg=arg, tr_bc=tr_bc,
                inv=inv, ty=ty)


def _rho_step_defer(ab, bb, xb, seg, t, trp, s, log_eps, norm_eps,
                    prep, dotf):
    tp = prep(t)
    bt = dotf(bb, tp)
    y = dotf(ab, tp) + s * bt
    gx = dotf(xb, prep(y))
    ehat_bc = seg(jnp.sum(y * gx, axis=0, keepdims=True))
    trp_c = jnp.maximum(trp, norm_eps)
    e_bc = ehat_bc / trp_c
    arg = jnp.maximum(1.0 + e_bc * s, log_eps)
    tr_bc = seg(jnp.sum(y * y, axis=0, keepdims=True))
    return dict(bt=bt, y=y, gx=gx, e_bc=e_bc, arg=arg, tr_bc=tr_bc)


def _make_rho_fwd_kernel_batched(cfg: CMPSConfig, unroll: int,
                                 rank: int, precision: str,
                                 stream: bool = False):
    """rho deferred forward, spine/limbs split (see
    _make_psi_fwd_kernel_batched): per step only the factor recurrence is
    latency-bound; the expectation GEMM X^T H runs once per block over the
    stored states, and ALL the skinny per-example segment reductions batch
    into a single [2K, BR]@[BR, B] dot."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, _, dotf, _ = _make_dot_ops_bwd(precision)
    segdot = _make_seg_dot(precision)
    K = unroll

    def kernel(*refs):
        if stream:
            (se_ref, seb_ref, t0_ref, ab_ref, bb_ref, xb_ref,
             z_ref, zt_ref,
             loss_ref, ck_ref, ys_ref, t_s, acc_s, ys_s, parts_s) = refs
        else:
            (se_ref, seb_ref, t0_ref, ab_ref, bb_ref, xb_ref,
             z_ref, zt_ref,
             loss_ref, ck_ref, t_s, acc_s, ys_s, parts_s) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        z, zt = z_ref[:], zt_ref[:]
        t = t_s[:]
        BR = t.shape[1]
        ck_ref[0] = t
        # --- sequential spine (trace partials stored as rows)
        tp = prep(t)
        ss_b = []
        for k in range(K):
            s = se_ref[0, k:k + 1, :]
            y = dotf(ab, tp) + s * dotf(bb, tp)
            tp = prep(y)
            ys_s[:, k * BR:(k + 1) * BR] = y
            parts_s[K + k:K + k + 1, :] = jnp.sum(y * y, axis=0,
                                                  keepdims=True)
            ss_b.append(seb_ref[0, k:k + 1, :])
            t = y
        # --- batched loss limb: one wide GEMM + one stacked seg dot
        ys = ys_s[:]
        if stream:
            ys_ref[0] = ys           # stream the block states to HBM
        gx_all = dotf(xb, prep(ys))
        e_lane = jnp.sum(ys * gx_all, axis=0, keepdims=True)  # [1, K*BR]
        for k in range(K):
            parts_s[k:k + 1, :] = e_lane[:, k * BR:(k + 1) * BR]
        red = segdot(parts_s[:], z)                  # [2K, B]
        acc_b = acc_s[:]
        trp_b = jnp.ones_like(acc_b)
        for k in range(K):
            ehat_b = red[k:k + 1]
            e_b = ehat_b / jnp.maximum(trp_b, norm_eps)
            arg_b = jnp.maximum(1.0 + e_b * ss_b[k], log_eps)
            acc_b = acc_b - jnp.log(arg_b)
            trp_b = red[K + k:K + k + 1]
        inv_b = jax.lax.rsqrt(jnp.maximum(trp_b, norm_eps))
        t_s[:] = t * segdot(inv_b, zt)
        acc_s[:] = acc_b
        loss_ref[0] = acc_b

    return kernel


def _make_rho_bwd_kernel_batched(cfg: CMPSConfig, unroll: int,
                                 n_blocks: int, inv_batch: float,
                                 rank: int, precision: str,
                                 stream: bool = False):
    """rho deferred adjoint, spine/limbs split (see
    _make_psi_bwd_kernel_batched): the reverse spine is
    dy -> (Ab^T dy, Bb^T dy) only; the X^T matvecs/adjoints, every
    parameter cotangent, and every segment reduction/broadcast run as
    per-block batched GEMMs over VMEM state buffers.

    ``stream=True`` (round 4): the forward streamed the block states to
    HBM, so the serial recompute spine disappears entirely — the state
    buffer fills from the ys input and the trace partials batch into one
    full-lane reduction; the ONLY serial work left in the whole backward
    is the reverse spine's 2 dependent dots/step."""
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr = _make_dot_ops(precision)
    segdot = _make_seg_dot(precision)
    K = unroll

    def kernel(*refs):
        if stream:
            (se_ref, seb_ref, ck_ref, ys_ref, ab_ref, bb_ref, xb_ref,
             z_ref, zt_ref,
             dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
             dt_s, aab_s, abb_s, axb_s, st_s, pu_s, dgx_s, dy_s,
             parts_s, rows_s) = refs
        else:
            (se_ref, seb_ref, ck_ref, ab_ref, bb_ref, xb_ref,
             z_ref, zt_ref,
             dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
             dt_s, aab_s, abb_s, axb_s, st_s, pu_s, dgx_s, dy_s,
             parts_s, rows_s) = refs
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, axb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        abT, bbT, xbT = tr(ab), tr(bb), tr(xb)
        z, zt = z_ref[:], zt_ref[:]

        # --- recompute spine (identical arithmetic to the forward) —
        # or, with streamed states, NO spine: fill the buffers from the
        # forward's stream and batch the trace partials
        t = ck_ref[0]
        BR = t.shape[1]
        st_s[:, 0:BR] = t
        ss, ss_b = [], []
        if stream:
            ys_in = ys_ref[0]
            st_s[:, BR:(K + 1) * BR] = ys_in
            trs = jnp.sum(ys_in * ys_in, axis=0, keepdims=True)
            for k in range(K):
                s = se_ref[0, k:k + 1, :]
                pu_s[:, k * BR:(k + 1) * BR] = \
                    s * st_s[:, k * BR:(k + 1) * BR]
                parts_s[K + k:K + k + 1, :] = trs[:, k * BR:(k + 1) * BR]
                ss.append(s)
                ss_b.append(seb_ref[0, k:k + 1, :])
            t = st_s[:, K * BR:(K + 1) * BR]
        else:
            tp = prep(t)
            for k in range(K):
                s = se_ref[0, k:k + 1, :]
                pu_s[:, k * BR:(k + 1) * BR] = s * t
                y = dotf(ab, tp) + s * dotf(bb, tp)
                tp = prep(y)
                st_s[:, (k + 1) * BR:(k + 2) * BR] = y
                parts_s[K + k:K + k + 1, :] = jnp.sum(y * y, axis=0,
                                                      keepdims=True)
                ss.append(s)
                ss_b.append(seb_ref[0, k:k + 1, :])
                t = y
        # --- batched forward tail
        ys = st_s[:, BR:(K + 1) * BR]
        pys = prep(ys)
        gx_all = dotf(xb, pys)
        e_lane = jnp.sum(ys * gx_all, axis=0, keepdims=True)
        for k in range(K):
            parts_s[k:k + 1, :] = e_lane[:, k * BR:(k + 1) * BR]
        red = segdot(parts_s[:], z)                  # [2K, B]
        trp_bs = [jnp.ones_like(red[0:1])] + [red[K + k:K + k + 1]
                                              for k in range(K - 1)]

        # --- block-exit renormalization adjoint seeds (per-example)
        dt_in = dt_s[:]
        trK_b = red[2 * K - 1:2 * K]
        inv_b = jax.lax.rsqrt(jnp.maximum(trK_b, norm_eps))
        dt = dt_in * segdot(inv_b, zt)
        dinv_b = segdot(jnp.sum(dt_in * t, axis=0, keepdims=True), z)
        dtr_exit = jnp.where(trK_b > norm_eps,
                             -0.5 * dinv_b * inv_b * inv_b * inv_b,
                             jnp.zeros_like(dinv_b))

        # --- batched reverse precompute (all forward-computable):
        # per-step [1,B] scalars, then ONE stacked broadcast [3K,B]@[B,BR]
        dtr_from_e = []
        for k in range(K):
            trp_c = jnp.maximum(trp_bs[k], norm_eps)
            e_b = red[k:k + 1] / trp_c
            arg_b = jnp.maximum(1.0 + e_b * ss_b[k], log_eps)
            darg_b = jnp.where(arg_b > log_eps, -inv_batch / arg_b,
                               jnp.zeros_like(arg_b))
            de_b = darg_b * ss_b[k]
            dtr_from_e.append(jnp.where(trp_bs[k] > norm_eps,
                                        -de_b * e_b / trp_c,
                                        jnp.zeros_like(de_b)))
            rows_s[K + k:K + k + 1, :] = de_b / trp_c
            rows_s[2 * K + k:2 * K + k + 1, :] = darg_b * e_b
        for k in range(K):
            # dtr used at step k = cotangent of tr_k (next step's
            # e-division, or the exit renorm for the last step)
            rows_s[k:k + 1, :] = (dtr_from_e[k + 1] if k < K - 1
                                  else dtr_exit)
        lanes = segdot(rows_s[:], zt)                # [3K, BR]
        for k in range(K):
            y = st_s[:, (k + 1) * BR:(k + 2) * BR]
            dgx_s[:, k * BR:(k + 1) * BR] = lanes[K + k:K + k + 1] * y
        pdgx_all = prep(dgx_s[:])
        xbtdgx_all = dotf(xbT, pdgx_all)

        # --- sequential reverse spine
        for k in reversed(range(K)):
            y = st_s[:, (k + 1) * BR:(k + 2) * BR]
            c = (2.0 * y * lanes[k:k + 1]
                 + lanes[K + k:K + k + 1] * gx_all[:, k * BR:(k + 1) * BR]
                 + xbtdgx_all[:, k * BR:(k + 1) * BR])
            dy = dt + c
            dy_s[:, k * BR:(k + 1) * BR] = dy
            pdy = prep(dy)
            du = dotf(bbT, pdy)
            dtn = dotf(abT, pdy) + ss[k] * du
            t_k = st_s[:, k * BR:(k + 1) * BR]
            ds = (lanes[2 * K + k:2 * K + k + 1] * (1.0 / rank)
                  + jnp.sum(du * t_k, axis=0, keepdims=True))
            dse_ref[0, k:k + 1, :] = ds
            dt = dtn

        # --- batched parameter cotangents
        pdy_all = prep(dy_s[:])
        d_xb = dotnt(pdgx_all, pys)
        d_ab = dotnt(pdy_all, prep(st_s[:, 0:K * BR]))
        d_bb = dotnt(pdy_all, prep(pu_s[:]))

        dt_s[:] = dt
        aab_s[:] = aab_s[:] + d_ab
        abb_s[:] = abb_s[:] + d_bb
        axb_s[:] = axb_s[:] + d_xb

        @pl.when(i == n_blocks - 1)
        def _emit():
            dab_ref[:] = aab_s[:]
            dbb_ref[:] = abb_s[:]
            dxb_ref[:] = axb_s[:]
            dt0_ref[:] = dt_s[:]

    return kernel


def _make_rho_fwd_kernel(cfg: CMPSConfig, unroll: int,
                         rank: int, precision: str, defer_norm: bool):
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)
    # the seg broadcasts are skinny [1,BR]@[BR,B] dots — negligible MXU
    # cost, so they stay at full fp32 precision in "high" mode
    seg_prec = "highest" if precision == "high" else precision

    def kernel(se_ref, seb_ref, t0_ref, ab_ref, bb_ref, xb_ref,
               z_ref, zt_ref,
               loss_ref, ck_ref, t_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        z, zt = z_ref[:], zt_ref[:]

        def seg(row):
            return _dot(_dot(row, z, seg_prec), zt, seg_prec)

        t = t_s[:]
        ck_ref[0] = t
        if defer_norm:
            # defer keeps the WHOLE loss path in per-example [1, B] space
            # (the split kernel's scheme) with the two per-step scalars
            # (expectation + trace partials) STACKED into one skinny
            # [2,BR]@[BR,B] contraction; the state path is broadcast-free,
            # so only the block-exit renormalization pays one
            # [1,B]@[B,BR] dot.
            # HAND-PIPELINED (r3): step k's loss tail (expectation GEMM +
            # stacked seg contraction) is emitted after step k+1's state
            # dots — identical arithmetic, pure reordering
            segdot = _make_seg_dot(precision)

            def loss_tail(acc_b, trp_b, pend):
                y0, py0, s_b0 = pend
                gx0 = dotf(xb, py0)
                parts = jnp.concatenate(
                    [jnp.sum(y0 * gx0, axis=0, keepdims=True),
                     jnp.sum(y0 * y0, axis=0, keepdims=True)], axis=0)
                red = segdot(parts, z)                 # [2, B]
                e_b = red[0:1] / jnp.maximum(trp_b, norm_eps)
                arg_b = jnp.maximum(1.0 + e_b * s_b0, log_eps)
                return acc_b - jnp.log(arg_b), red[1:2]

            acc_b = acc_s[:]
            trp_b = jnp.ones_like(acc_b)
            tp = prep(t)
            pend = None
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                s_b = seb_ref[0, k:k + 1, :]
                y = dotf(ab, tp) + s * dotf(bb, tp)
                tp = prep(y)          # deferred chain: reused next step
                if pend is not None:
                    acc_b, trp_b = loss_tail(acc_b, trp_b, pend)
                pend = (y, tp, s_b)
                t = y
            acc_b, trp_b = loss_tail(acc_b, trp_b, pend)
            inv_b = jax.lax.rsqrt(jnp.maximum(trp_b, norm_eps))
            t = t * _dot(inv_b, zt, seg_prec)
            t_s[:] = t
            acc_s[:] = acc_b
            loss_ref[0] = acc_b
            return
        acc = acc_s[:]
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _rho_step(ab, bb, xb, seg, t, s, log_eps, norm_eps,
                          prep, dotf)
            acc = acc - jnp.log(f["arg"])
            t = f["ty"]

        t_s[:] = t
        acc_s[:] = acc
        # lanes within an example's rank-group are identical; average out
        loss_ref[0] = _dot(acc, z_ref[:]) * (1.0 / rank)

    return kernel


def _make_rho_bwd_kernel(cfg: CMPSConfig, unroll: int,
                         n_blocks: int, inv_batch_rank: float,
                         precision: str):
    """inv_batch_rank = 1 / (B * rank): d(mean loss)/d(acc lane)."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, tr = _make_dot_ops(precision)
    seg_prec = "highest" if precision == "high" else precision

    def kernel(se_ref, ck_ref, ab_ref, bb_ref, xb_ref, z_ref, zt_ref,
               dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
               dt_s, aab_s, abb_s, axb_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, axb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        abT, bbT, xbT = tr(ab), tr(bb), tr(xb)
        z, zt = z_ref[:], zt_ref[:]

        def seg(row):
            return _dot(_dot(row, z, seg_prec), zt, seg_prec)

        # --- recompute the block from its checkpoint
        t = ck_ref[0]
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            f = _rho_step(ab, bb, xb, seg, t, s, log_eps, norm_eps,
                          prep, dotf)
            saved.append((t, f["bt"], f["y"], f["gx"]))
            t = f["ty"]

        # --- reverse sweep
        dt = dt_s[:]
        a_ab, a_bb, a_xb = aab_s[:], abb_s[:], axb_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            tin, bt, y, gx = saved[k]
            # scalar tail recompute (VPU + skinny seg matmuls)
            e_bc = seg(jnp.sum(y * gx, axis=0, keepdims=True))
            arg = jnp.maximum(1.0 + e_bc * s, log_eps)
            tr_bc = seg(jnp.sum(y * y, axis=0, keepdims=True))
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))

            # normalize adjoint: ty = y * inv
            dy = dt * inv
            dinv = jnp.sum(dt * y, axis=0, keepdims=True)
            dtr_bc = jnp.where(tr_bc > norm_eps,
                               -0.5 * dinv * inv * inv * inv,
                               jnp.zeros_like(dinv))
            dtr_part = seg(dtr_bc)          # seg broadcast is self-adjoint
            dy = dy + 2.0 * y * dtr_part
            # loss adjoint
            darg = jnp.where(arg > log_eps, -inv_batch_rank / arg,
                             jnp.zeros_like(arg))
            de_bc = darg * s
            ds = darg * e_bc
            de_part = seg(de_bc)
            # e_part = sum(y . gx)
            dy = dy + de_part * gx
            dgx = de_part * y
            # gx = Xb y adjoint
            pdgx = prep(dgx)
            dy = dy + dotf(xbT, pdgx)
            py_t = prep(y.T)
            d_xb = dotf(pdgx, py_t)
            # y = Ab t + s * (Bb t)
            ds = ds + jnp.sum(dy * bt, axis=0, keepdims=True)
            sdy = s * dy
            pdy, psdy = prep(dy), prep(sdy)
            dtn = dotf(abT, pdy) + dotf(bbT, psdy)
            ptinT = prep(tin.T)
            d_ab = dotf(pdy, ptinT)
            d_bb = dotf(psdy, ptinT)

            dse_ref[0, k:k + 1, :] = ds
            dt = dtn
            a_ab = a_ab + d_ab
            a_bb = a_bb + d_bb
            a_xb = a_xb + d_xb

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


def _make_rho_bwd_kernel_defer(cfg: CMPSConfig, unroll: int,
                               n_blocks: int, inv_batch: float,
                               rank: int, precision: str):
    """Deferred-normalization adjoint: carries the per-example trace
    cotangent dtr_b alongside dt; no per-step normalize adjoint.

    RESTRUCTURED reverse sweep (round 3, VERDICT item 1): identical to
    _make_psi_bwd_kernel_defer's restructure — the recompute saves the
    prepped tp/pu/py operands (tp reuses the previous step's py since the
    deferred state chain is t_{k+1} = y_k), and the reverse sweep uses
    lane-contraction dotnt for the parameter cotangents (no per-step
    transposes) with d_bb = dy @ u^T and du = Bb^T dy serving both dtn
    and ds. This is THE hot backward for the rho family's wide
    [2D, B*rank] operands — the split overhead named in BENCH_r02's
    bf16x3 gap."""
    # log_eps <= 0 reproduces the reference's unclamped NaN semantics
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, rec, dotf, dotnt = _make_dot_ops_bwd(precision)
    _, _, tr = _make_dot_ops(precision)
    seg_prec = "highest" if precision == "high" else precision

    def kernel(se_ref, seb_ref, ck_ref, ab_ref, bb_ref, xb_ref,
               z_ref, zt_ref,
               dse_ref, dab_ref, dbb_ref, dxb_ref, dt0_ref,
               dt_s, aab_s, abb_s, axb_s):
        i = pl.program_id(0)    # reversed grid (blockspecs map nb-1-i)

        @pl.when(i == 0)
        def _init():
            for ref in (dt_s, aab_s, abb_s, axb_s):
                ref[:] = jnp.zeros_like(ref)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        abT, bbT, xbT = tr(ab), tr(bb), tr(xb)
        z, zt = z_ref[:], zt_ref[:]

        segdot = _make_seg_dot(precision)

        def seg_b(row):
            """[1,BR] rank-group partial sums -> per-example [1,B]."""
            return segdot(row, z)

        def bcast(row_b):
            """per-example [r,B] -> lanes [r,BR]."""
            return segdot(row_b, zt)

        # --- recompute the unnormalized chain from the checkpoint,
        # saving the PREPPED operands for the reverse sweep; the trace
        # chain lives in per-example [1,B] space (one skinny contraction
        # per step, no broadcasts)
        t = ck_ref[0]
        tp = prep(t)
        trp_b = jnp.ones_like(seb_ref[0, 0:1, :])
        saved = []
        for k in range(unroll):
            s = se_ref[0, k:k + 1, :]
            pu = prep(s * t)
            y = dotf(ab, tp) + dotf(bb, pu)       # Ab t + Bb (s t)
            py = prep(y)
            saved.append((tp, pu, py, dotf(xb, py), trp_b))
            t = y                                  # defer: t_{k+1} = y_k
            tp = py
            trp_b = seg_b(jnp.sum(y * y, axis=0, keepdims=True))

        # --- block-exit renormalization adjoint seeds (dt, dtr_b)
        dt_in = dt_s[:]
        inv_b = jax.lax.rsqrt(jnp.maximum(trp_b, norm_eps))
        dt = dt_in * bcast(inv_b)
        dinv_b = seg_b(jnp.sum(dt_in * t, axis=0, keepdims=True))
        dtr_b = jnp.where(trp_b > norm_eps,
                          -0.5 * dinv_b * inv_b * inv_b * inv_b,
                          jnp.zeros_like(dinv_b))

        a_ab, a_bb, a_xb = aab_s[:], abb_s[:], axb_s[:]
        for k in reversed(range(unroll)):
            s = se_ref[0, k:k + 1, :]
            s_b = seb_ref[0, k:k + 1, :]
            tp_k, pu_k, py_k, gx, trp_bk = saved[k]
            t_k = rec(tp_k)
            y = rec(py_k)
            # scalar tail recompute — per-example [1,B] space
            ehat_b = seg_b(jnp.sum(y * gx, axis=0, keepdims=True))
            trp_c = jnp.maximum(trp_bk, norm_eps)
            e_b = ehat_b / trp_c
            arg_b = jnp.maximum(1.0 + e_b * s_b, log_eps)

            # loss adjoint (mean over B of acc_b): d acc_b = 1/B
            darg_b = jnp.where(arg_b > log_eps, -inv_batch / arg_b,
                               jnp.zeros_like(arg_b))
            de_b = darg_b * s_b
            ds_b = darg_b * e_b
            dtr_b_new = jnp.where(trp_bk > norm_eps,
                                  -de_b * e_b / trp_c,
                                  jnp.zeros_like(de_b))
            # ONE stacked broadcast back to lanes per step: the trace
            # cotangent (from the next step's e-division / block-exit
            # renorm), the e-path cotangent, and the per-example signal
            # cotangent ride a single [3,B]@[B,BR] dot
            rows = jnp.concatenate([dtr_b, de_b / trp_c, ds_b], axis=0)
            lanes = bcast(rows)                    # [3, BR]
            dtr_lanes = lanes[0:1]
            de_lanes = lanes[1:2]
            dy = dt + 2.0 * y * dtr_lanes + de_lanes * gx
            dgx = de_lanes * y
            # gx = Xb y adjoint
            pdgx = prep(dgx)
            dy = dy + dotf(xbT, pdgx)
            # y = Ab t + Bb u, u = s .* t
            pdy = prep(dy)
            du = dotf(bbT, pdy)                    # Bb^T dy
            dtn = dotf(abT, pdy) + s * du          # s commutes per lane
            # dse lanes: the per-example darg*e term spreads over the
            # rank copies (jnp.repeat's adjoint outside sums them), the
            # state term sum(du . t) is genuinely per-lane
            ds = (lanes[2:3] * (1.0 / rank)
                  + jnp.sum(du * t_k, axis=0, keepdims=True))
            a_xb = a_xb + dotnt(pdgx, py_k)        # dgx @ y^T
            a_ab = a_ab + dotnt(pdy, tp_k)         # dy @ t^T
            a_bb = a_bb + dotnt(pdy, pu_k)         # dy @ u^T = (s dy) t^T

            dse_ref[0, k:k + 1, :] = ds
            dt = dtn
            dtr_b = dtr_b_new
        # leftover dtr_b sits on the block-entry trace (constant 1): discard

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


@functools.lru_cache(maxsize=64)
def _rho_block_factory(cfg: CMPSConfig, B: int, T: int, rank: int,
                       unroll: int, interpret: bool, precision: str,
                       defer_norm: bool, batched: Optional[bool] = None,
                       stream: bool = False):
    """`batched=None` auto-selects the spine/limbs-split kernels when
    defer_norm is on and B*rank is a multiple of 128 (tile-aligned static
    lane slices of the VMEM state buffers); tests pin the numerics at
    small shapes via batched=True + interpret.

    ``stream=True`` (requires the batched kernels): the forward streams
    the block states to HBM and the backward's recompute spine disappears
    (see _make_rho_bwd_kernel_batched)."""
    D2 = 2 * cfg.bond_dim
    BR = B * rank
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll
    if batched is None:
        # stream builds on the batched kernels: explicit stream=True at
        # small BR (interpret-mode tests) implies them
        batched = (defer_norm and BR % 128 == 0) or stream
    if batched and not defer_norm:
        raise ValueError("batched kernels implement the deferred-"
                         "normalization semantics only")
    if batched and not interpret and BR % 128 != 0:
        raise ValueError(
            f"batched rho kernels need B*rank % 128 == 0 on TPU (static "
            f"lane slices of the VMEM state buffers must be tile-aligned), "
            f"got B*rank={BR}")
    if stream and not batched:
        raise ValueError("streamed-states rho kernels build on the "
                         "batched (spine/limbs) kernels; stream=True "
                         "requires batched")

    if batched:
        fwd_kernel = _make_rho_fwd_kernel_batched(cfg, unroll, rank,
                                                  precision, stream)
        bwd_kernel = _make_rho_bwd_kernel_batched(cfg, unroll, n_blocks,
                                                  1.0 / B, rank, precision,
                                                  stream)
    else:
        fwd_kernel = _make_rho_fwd_kernel(cfg, unroll, rank, precision,
                                          defer_norm)
        bwd_kernel = (_make_rho_bwd_kernel_defer(cfg, unroll, n_blocks,
                                                 1.0 / B, rank, precision)
                      if defer_norm else
                      _make_rho_bwd_kernel(cfg, unroll, n_blocks,
                                           1.0 / (B * rank), precision))
    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)

    def run_fwd(ab, bb, xb, t0, se, seb, z, zt):
        se3 = se.reshape(n_blocks, unroll, BR)
        seb3 = seb.reshape(n_blocks, unroll, B)
        scratch = [
            pltpu.VMEM((D2, BR), jnp.float32),
            pltpu.VMEM((1, B if defer_norm else BR), jnp.float32),
        ]
        if batched:
            scratch += [
                pltpu.VMEM((D2, unroll * BR), jnp.float32),   # states
                pltpu.VMEM((2 * unroll, BR), jnp.float32),    # seg partials
            ]
        out_specs = [
            pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D2, BR), lambda i: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, D2, BR), jnp.float32),
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
                pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
                _full((D2, BR)),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((BR, B)), _full((B, BR)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=sem,
            interpret=interpret,
        )(se3, seb3, t0, ab, bb, xb, z, zt)
        return (jnp.mean(outs[0][-1, 0]), outs[1]) + (
            (outs[2],) if stream else ())

    def run_bwd(ab, bb, xb, se, seb, z, zt, ck, ys=None):
        rev3 = lambda i: (n_blocks - 1 - i, 0, 0)
        se3 = se.reshape(n_blocks, unroll, BR)
        seb3 = seb.reshape(n_blocks, unroll, B)
        if defer_norm:
            in_specs = [
                pl.BlockSpec((1, unroll, BR), rev3),
                pl.BlockSpec((1, unroll, B), rev3),
                pl.BlockSpec((1, D2, BR), rev3),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((BR, B)), _full((B, BR)),
            ]
            args = (se3, seb3, ck, ab, bb, xb, z, zt)
            if stream:
                in_specs.insert(3, pl.BlockSpec((1, D2, unroll * BR),
                                                rev3))
                args = (se3, seb3, ck, ys, ab, bb, xb, z, zt)
        else:
            in_specs = [
                pl.BlockSpec((1, unroll, BR), rev3),
                pl.BlockSpec((1, D2, BR), rev3),
                _full((D2, D2)), _full((D2, D2)), _full((D2, D2)),
                _full((BR, B)), _full((B, BR)),
            ]
            args = (se3, ck, ab, bb, xb, z, zt)
        scratch = [
            pltpu.VMEM((D2, BR), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
            pltpu.VMEM((D2, D2), jnp.float32),
        ]
        if batched:
            scratch += [
                pltpu.VMEM((D2, (unroll + 1) * BR), jnp.float32),  # states
                pltpu.VMEM((D2, unroll * BR), jnp.float32),        # s*t
                pltpu.VMEM((D2, unroll * BR), jnp.float32),        # dgx
                pltpu.VMEM((D2, unroll * BR), jnp.float32),        # dy
                pltpu.VMEM((2 * unroll, BR), jnp.float32),  # seg partials
                pltpu.VMEM((3 * unroll, B), jnp.float32),   # bcast rows
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
    def fused(ab, bb, xb, t0, se, seb, z, zt):
        return run_fwd(ab, bb, xb, t0, se, seb, z, zt)[0]

    def fused_fwd(ab, bb, xb, t0, se, seb, z, zt):
        outs = run_fwd(ab, bb, xb, t0, se, seb, z, zt)
        return outs[0], (ab, bb, xb, se, seb, z, zt) + tuple(outs[1:])

    def fused_bwd(res, g):
        ab, bb, xb, se, seb, z, zt, ck = res[:8]
        ys = res[8] if stream else None
        dse, dab, dbb, dxb, dt0 = run_bwd(ab, bb, xb, se, seb, z, zt, ck,
                                          ys)
        # the loss-path (darg*e) signal cotangent is already folded into
        # the per-lane dse (spread over the rank copies; jnp.repeat's
        # adjoint outside sums them back), so seb carries no cotangent
        return (g * dab, g * dbb, g * dxb, g * dt0, g * dse,
                jnp.zeros_like(seb), jnp.zeros_like(z), jnp.zeros_like(zt))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def rho_nll_block_trainable(params, cfg: CMPSConfig, signals, *,
                            unroll: Optional[int] = None,
                            interpret: Optional[bool] = None,
                            precision: str = "highest",
                            defer_norm: bool = False,
                            stream: Optional[bool] = None):
    """Block-layout differentiable fused NLL for the mixed-state model
    (purification-factor form; semantics of core.rho_nll); drop-in for
    pallas_grad.rho_nll_pallas_trainable. ``stream=None`` auto-enables
    the streamed-states kernels where measured faster (see
    auto_stream; columns are B*rank here)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"block layout requires bond_dim % 4 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    rank_p = auto_pad_rank(cfg, B, rank, T, defer_norm, interpret)
    unroll = auto_unroll(2 * D, B * rank_p, unroll)
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    seb = _pad_rows(incs, t_pad)                       # per-example rows
    se = jnp.repeat(seb, rank_p, axis=1)               # rank-expanded lanes

    # rank_p > rank: zero factor rows ride as dummy lanes inside each
    # example's rank segment — exactly zero through the linear update,
    # so every segment sum (trace, expectation) and the per-example loss
    # are unchanged (auto_pad_rank; values + grads pinned by tests)
    h0r, h0i, zmat = _rho_factor_inputs(params, cfg, B,
                                        rank_pad=rank_p)

    ab, bb, xb = _rho_block_constants(cc)
    t0 = _rho_block_t0(cc, h0r, h0i)
    if stream is None:
        stream = auto_stream(cfg, B * rank_p, T, defer_norm, interpret)
    fused = _rho_block_factory(cfg, B, T, rank_p, unroll, interpret,
                               precision, defer_norm, None, stream)
    return fused(ab, bb, xb, t0, se, seb, zmat, zmat.T)


# ===========================================================================
# Samplers (Euler–Maruyama SDE; reference model.py:103-112, 242-251) —
# block layout, frame rotation folded into the step constants.
#
# The expectation is taken on the CURRENT state x = conj(p) .* t (psi):
# with ru = (R diag(conj p)) t = R x (reused by the conditioned update,
# like the split kernel), e = 2 Re<x|ru> = 2 sum(t_r*w_r + t_i*w_i) where
# w = p .* ru — an elementwise phase twist on static half-slices of the
# stacked [2D, N] arrays. Half-slices need D % 8 == 0 (full sublane
# tiles); supports_block_sampler() gates it.
# ===========================================================================

def supports_block_sampler(cfg: CMPSConfig) -> bool:
    """The sampler kernels half-slice the stacked state (D sublanes)."""
    return cfg.bond_dim % 8 == 0


def _make_psi_sample_kernel(cfg: CMPSConfig, unroll: int, D: int,
                            precision: str):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)

    def kernel(nz_ref,               # [K, N] noise rows
               t0_ref,               # [2D, N] stacked folded state
               ab_ref, bb_ref,       # [2D,2D] Bk(C~), Bk(R~)
               pc_ref, ps_ref,       # [D, 1] phase p for the e-twist
               ia_ref,               # [1, 1] 1/A (traced param)
               wav_ref,              # out [K, N]
               t_s, samp_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            samp_s[:] = jnp.zeros_like(samp_s)

        ab, bb = prep(ab_ref[:]), prep(bb_ref[:])
        pc, ps = pc_ref[:], ps_ref[:]
        ia = ia_ref[0, 0]

        t = t_s[:]
        samp = samp_s[:]
        for k in range(unroll):
            tp = prep(t)
            ru = dotf(bb, tp)            # R x (reused below)
            rur, rui = ru[:D], ru[D:]
            wr = pc * rur - ps * rui     # w = p .* ru
            wi = pc * rui + ps * rur
            e = 2.0 * jnp.sum(t[:D] * wr + t[D:] * wi, axis=0,
                              keepdims=True)
            inc = e * dt + nz_ref[k:k + 1, :]
            samp = samp + inc
            wav_ref[k:k + 1, :] = samp
            s = inc * ia
            y = dotf(ab, tp) + s * ru    # y = C x + (inc/A) R x
            n2 = jnp.sum(y * y, axis=0, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
            t = y * inv                  # rotation folded: t' = normalize(y)

        t_s[:] = t
        samp_s[:] = samp

    return kernel


def psi_sample_block(params, cfg: CMPSConfig, noise, *,
                     unroll: int = 16,
                     interpret: Optional[bool] = None,
                     precision: str = "highest",
                     psi0_pair=None):
    """Waveforms [N, T] from noise [T, N] — block-layout fused SDE sampler
    (semantics of core.sample_psi_with_noise / reference model.py:242-251;
    drop-in for pallas_scan.psi_sample_pallas). ``psi0_pair``: optional
    per-example [N, D] initial-state pair (latent family)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block_sampler(cfg):
        raise ValueError(
            f"block sampler requires bond_dim % 8 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    n_blocks = max(1, -(-T // unroll))
    t_pad = n_blocks * unroll
    nz = _pad_rows(noise, t_pad)

    if psi0_pair is not None:
        t0 = _psi_block_t0(cc, psi0_pair[0].T, psi0_pair[1].T)
    else:
        pr0, pi0 = core.psi0(params, cfg)
        t0 = _psi_block_t0(cc, jnp.broadcast_to(pr0[:, None], (D, N)),
                           jnp.broadcast_to(pi0[:, None], (D, N)))
    ab, bb, _ = _psi_block_constants(cc)

    kernel = _make_psi_sample_kernel(cfg, unroll, D, precision)
    wave = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, N), lambda i: (i, 0)),
            _full((2 * D, N)),
            _full((2 * D, 2 * D)), _full((2 * D, 2 * D)),
            _full((D, 1)), _full((D, 1)),
            _full((1, 1)),
        ],
        out_specs=pl.BlockSpec((unroll, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * D, N), jnp.float32),
            pltpu.VMEM((1, N), jnp.float32),
        ],
        interpret=interpret,
    )(nz, t0, ab, bb, cc.p_c[:, None], cc.p_s[:, None],
      (1.0 / cc.A).reshape(1, 1))
    return cc.A * wave[:T].T


def _make_rho_sample_kernel(cfg: CMPSConfig, unroll: int, D: int, rank: int,
                            precision: str):
    dt = cfg.delta_t
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)
    seg_prec = "highest" if precision == "high" else precision

    def kernel(nz_ref,                 # [K, NR] expanded noise rows
               t0_ref,                 # [2D, NR]
               ab_ref, bb_ref, xb_ref,  # [2D,2D] Bk(A~), Bk(B~), Bk(X^T P)
               pc_ref, ps_ref,          # [D, 1]
               z_ref, zt_ref,
               ia_ref,
               wav_ref,                # out [K, NR]
               t_s, samp_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            samp_s[:] = jnp.zeros_like(samp_s)

        ab, bb, xb = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        pc, ps = pc_ref[:], ps_ref[:]
        z, zt = z_ref[:], zt_ref[:]
        ia = ia_ref[0, 0]

        def seg(row):
            return _dot(_dot(row, z, seg_prec), zt, seg_prec)

        t = t_s[:]
        samp = samp_s[:]
        for k in range(unroll):
            tp = prep(t)
            gx = dotf(xb, tp)            # X^T H on the CURRENT state
            gxr, gxi = gx[:D], gx[D:]
            vr = pc * gxr + ps * gxi     # v = conj(p) .* gx
            vi = pc * gxi - ps * gxr
            e_bc = seg(jnp.sum(t[:D] * vr + t[D:] * vi, axis=0,
                               keepdims=True))
            inc = e_bc * dt + nz_ref[k:k + 1, :]
            samp = samp + inc
            wav_ref[k:k + 1, :] = samp
            s = inc * ia
            y = dotf(ab, tp) + s * dotf(bb, tp)
            tr_bc = seg(jnp.sum(y * y, axis=0, keepdims=True))
            inv = jax.lax.rsqrt(jnp.maximum(tr_bc, norm_eps))
            t = y * inv

        t_s[:] = t
        samp_s[:] = samp

    return kernel


def rho_sample_block(params, cfg: CMPSConfig, noise, *,
                     unroll: int = 16,
                     interpret: Optional[bool] = None,
                     precision: str = "highest"):
    """Waveforms [N, T] from noise [T, N] — block-layout fused SDE sampler
    in purification-factor form (semantics of core.sample_rho_with_noise /
    reference model.py:103-112; drop-in for pallas_scan.rho_sample_pallas)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block_sampler(cfg):
        raise ValueError(
            f"block sampler requires bond_dim % 8 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    T, N = noise.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    NR = N * rank
    n_blocks = max(1, -(-T // unroll))
    t_pad = n_blocks * unroll
    nz = jnp.repeat(_pad_rows(noise, t_pad), rank, axis=1)

    h0r, h0i, zmat = _rho_factor_inputs(params, cfg, N)

    ab, bb, _ = _rho_block_constants(cc)
    # the sampler's expectation acts on the CURRENT state H = p .* t, so
    # X^T needs the same diag(p) fold as the update operators:
    # gx = X^T H = (X^T diag(p)) t; the conj(p) twist in the kernel then
    # recovers e = Re sum(conj(H) . gx) from the folded state t
    pc, ps = cc.p_c, cc.p_s
    xb = block_embed(cc.Xr.T * pc[None, :] - cc.Xi.T * ps[None, :],
                     cc.Xi.T * pc[None, :] + cc.Xr.T * ps[None, :])
    t0 = _rho_block_t0(cc, h0r, h0i)

    kernel = _make_rho_sample_kernel(cfg, unroll, D, rank, precision)
    wave = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((unroll, NR), lambda i: (i, 0)),
            _full((2 * D, NR)),
            _full((2 * D, 2 * D)), _full((2 * D, 2 * D)),
            _full((2 * D, 2 * D)),
            _full((D, 1)), _full((D, 1)),
            _full((NR, N)), _full((N, NR)),
            _full((1, 1)),
        ],
        out_specs=pl.BlockSpec((unroll, NR), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, NR), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * D, NR), jnp.float32),
            pltpu.VMEM((1, NR), jnp.float32),
        ],
        interpret=interpret,
    )(nz, t0, ab, bb, xb, cc.p_c[:, None], cc.p_s[:, None],
      zmat, zmat.T, (1.0 / cc.A).reshape(1, 1))
    return cc.A * wave[:T, ::rank].T


# ===========================================================================
# Forward-only NLL kernels (eval path; no checkpoints streamed).
# Same step math as the trainable forward kernels; used by the layout
# dispatch in pallas_scan.psi_nll_pallas / rho_nll_pallas.
# ===========================================================================

def psi_nll_block(params, cfg: CMPSConfig, signals, *,
                  unroll: int = 16,
                  interpret: Optional[bool] = None,
                  precision: str = "highest",
                  defer_norm: bool = False):
    """Mean NLL of waveforms [B, T] — block-layout fused forward (semantics
    of core.psi_nll; drop-in for pallas_scan.psi_nll_pallas)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"block layout requires bond_dim % 4 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = _pad_rows(incs, t_pad).reshape(n_blocks, unroll, B)
    pr0, pi0 = core.psi0(params, cfg)
    t0 = _psi_block_t0(cc, jnp.broadcast_to(pr0[:, None], (D, B)),
                       jnp.broadcast_to(pi0[:, None], (D, B)))
    ab, bb, rb = _psi_block_constants(cc)

    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, rb_ref, loss_ref,
               t_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        abp, bbp, rbp = prep(ab_ref[:]), prep(bb_ref[:]), prep(rb_ref[:])
        t = t_s[:]
        acc = acc_s[:]
        if defer_norm:
            n2p = jnp.ones_like(acc)
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _psi_step_defer(abp, bbp, rbp, t, n2p, s, log_eps,
                                    norm_eps, prep, dotf)
                acc = acc - jnp.log(f["arg"])
                t = f["y"]
                n2p = f["n2"]
            inv = jax.lax.rsqrt(jnp.maximum(n2p, norm_eps))
            t = t * inv
        else:
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _psi_step(abp, bbp, rbp, t, s, log_eps, norm_eps,
                              prep, dotf)
                acc = acc - jnp.log(f["arg"])
                t = f["ty"]
        t_s[:] = t
        acc_s[:] = acc
        loss_ref[0] = acc

    loss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_FWD_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, unroll, B), lambda i: (i, 0, 0)),
            _full((2 * D, B)),
            _full((2 * D, 2 * D)), _full((2 * D, 2 * D)),
            _full((2 * D, 2 * D)),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * D, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(se, t0, ab, bb, rb)
    return jnp.mean(loss[-1, 0])


def rho_nll_block(params, cfg: CMPSConfig, signals, *,
                  unroll: int = 16,
                  interpret: Optional[bool] = None,
                  precision: str = "highest",
                  defer_norm: bool = False):
    """Mean NLL of waveforms [B, T] — block-layout fused forward in
    purification-factor form (semantics of core.rho_nll; drop-in for
    pallas_scan.rho_nll_pallas)."""
    if interpret is None:
        interpret = not _on_tpu()
    if not supports_block(cfg):
        raise ValueError(
            f"block layout requires bond_dim % 4 == 0, got {cfg.bond_dim}")
    cc = make_constants(params, cfg)
    B, T = signals.shape
    D = cfg.bond_dim
    rank = params.Wx.shape[0]
    BR = B * rank
    n_steps = T - 1
    n_blocks = max(1, -(-n_steps // unroll))
    t_pad = n_blocks * unroll

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
    se = jnp.repeat(_pad_rows(incs, t_pad), rank,
                    axis=1).reshape(n_blocks, unroll, BR)

    h0r, h0i, zmat = _rho_factor_inputs(params, cfg, B)

    ab, bb, xb = _rho_block_constants(cc)
    t0 = _rho_block_t0(cc, h0r, h0i)

    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)
    seg_prec = "highest" if precision == "high" else precision

    def kernel(se_ref, t0_ref, ab_ref, bb_ref, xb_ref, z_ref, zt_ref,
               loss_ref, t_s, acc_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            t_s[:] = t0_ref[:]
            acc_s[:] = jnp.zeros_like(acc_s)

        abp, bbp, xbp = prep(ab_ref[:]), prep(bb_ref[:]), prep(xb_ref[:])
        z, zt = z_ref[:], zt_ref[:]

        def seg(row):
            return _dot(_dot(row, z, seg_prec), zt, seg_prec)

        t = t_s[:]
        acc = acc_s[:]
        if defer_norm:
            trp = jnp.ones_like(acc)
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _rho_step_defer(abp, bbp, xbp, seg, t, trp, s, log_eps,
                                    norm_eps, prep, dotf)
                acc = acc - jnp.log(f["arg"])
                t = f["y"]
                trp = f["tr_bc"]
            inv = jax.lax.rsqrt(jnp.maximum(trp, norm_eps))
            t = t * inv
        else:
            for k in range(unroll):
                s = se_ref[0, k:k + 1, :]
                f = _rho_step(abp, bbp, xbp, seg, t, s, log_eps, norm_eps,
                              prep, dotf)
                acc = acc - jnp.log(f["arg"])
                t = f["ty"]
        t_s[:] = t
        acc_s[:] = acc
        loss_ref[0] = _dot(acc, z_ref[:]) * (1.0 / rank)

    loss = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, unroll, BR), lambda i: (i, 0, 0)),
            _full((2 * D, BR)),
            _full((2 * D, 2 * D)), _full((2 * D, 2 * D)),
            _full((2 * D, 2 * D)),
            _full((BR, B)), _full((B, BR)),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * D, BR), jnp.float32),
            pltpu.VMEM((1, BR), jnp.float32),
        ],
        interpret=interpret,
    )(se, t0, ab, bb, xb, zmat, zmat.T)
    return jnp.mean(loss[-1, 0])
