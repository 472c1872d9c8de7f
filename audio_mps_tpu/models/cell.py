"""The cMPS physics cell: one measurement-conditioned ancilla update.

This is the TPU-native redesign of the reference hot loop
(reference: model.py:152-203 for rho, model.py:276-334 for psi).

Key reformulation — the rotating (interaction) frame
---------------------------------------------------
The reference recomputes ``phases = exp(i*freqs*t)`` and the rotated operator
``Rt = diag(phases) R diag(phases)*`` every step (model.py:178-179, 305).
Because the Hamiltonian is diagonal, we evolve the ancilla in the rotating
frame instead: define ``rho~_n = D_n^dag rho_n D_n`` with
``D_n = diag(exp(i*freqs*n*dt))``. Then one lab-frame step

    rho_{n+1} = U_n rho_n U_n^dag,   U_n = 1 - (sigma^2 dt/2) Rt^dag Rt + s_n Rt

becomes, exactly,

    rho~''   = U~ rho~ U~^dag,        U~ = C + s_n R          (time-independent!)
    rho~_{n+1} = rho~'' .* Phi,       Phi_ij = exp(i (f_j - f_i) dt)  (constant)

with ``C = 1 - (sigma^2 dt/2) R^dag R`` constant across the scan. All
transcendentals leave the hot loop; each step is pure (batched) D x D complex
matmul + one elementwise rotation — exactly what the MXU wants. The
expectation is frame-invariant: ``<x> = Re tr[(R + R^dag) rho~]``.

The psi variant is analogous: ``psi~'' = psi~ + (-(sigma^2 dt/2) K + s R) psi~``
then ``psi~ <- conj(p) .* psi~''`` with ``p = exp(i f dt)``, ``K = R^dag R``.

All complex algebra is split into real pairs (see ops/complexing.py) because
this TPU backend has no complex dtype.

Lab-frame single-step functions (`lab_*`) mirror the reference private
methods exactly (same signature semantics, explicit time argument) — they
exist as the test seam proving the rotating-frame path is equivalent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import CMPSConfig
from ..ops.complexing import (apply_matrix, cmatmul, cmatmul_adj_right, cmul,
                              gram_adj)


def effective_R(params):
    """R with its (gauge) diagonal zeroed (reference: model.py:42; the
    reference's broadcasted subtraction is a quirk, the tested property is a
    zero diagonal — tests/test_model.py:19-25)."""
    d = params.Rx.shape[-1]
    mask = 1.0 - jnp.eye(d, dtype=params.Rx.dtype)
    return params.Rx * mask, params.Ry * mask


@struct.dataclass
class CellConstants:
    """Scan-invariant derived quantities, built once per loss/sample call
    (inside the differentiated function so gradients flow to params)."""

    Rr: jnp.ndarray   # effective R, zero diagonal
    Ri: jnp.ndarray
    Kr: jnp.ndarray   # K = R^dag R
    Ki: jnp.ndarray
    Cr: jnp.ndarray   # C = I - (sigma^2 dt / 2) K
    Ci: jnp.ndarray
    Xr: jnp.ndarray   # X = R + R^dag  (expectation operator)
    Xi: jnp.ndarray
    phi_c: jnp.ndarray  # [D,D] cos/sin of (f_j - f_i) dt  (rho rotation)
    phi_s: jnp.ndarray
    p_c: jnp.ndarray    # [D] cos/sin of f dt  (psi rotation)
    p_s: jnp.ndarray
    A: jnp.ndarray      # trainable amplitude scale (scalar)


def make_constants(params, cfg: CMPSConfig) -> CellConstants:
    Rr, Ri = effective_R(params)
    Kr, Ki = gram_adj(Rr, Ri)
    half = 0.5 * (cfg.sigma ** 2) * cfg.delta_t
    d = Rr.shape[-1]
    eye = jnp.eye(d, dtype=Rr.dtype)
    Cr = eye - half * Kr
    Ci = -half * Ki
    Xr = Rr + Rr.T
    Xi = Ri - Ri.T
    f = params.freqs
    df = (f[None, :] - f[:, None]) * cfg.delta_t   # (f_j - f_i) dt
    phi_c = jnp.cos(df)
    phi_s = jnp.sin(df)
    p_c = jnp.cos(f * cfg.delta_t)
    p_s = jnp.sin(f * cfg.delta_t)
    return CellConstants(Rr=Rr, Ri=Ri, Kr=Kr, Ki=Ki, Cr=Cr, Ci=Ci,
                         Xr=Xr, Xi=Xi, phi_c=phi_c, phi_s=phi_s,
                         p_c=p_c, p_s=p_s, A=params.A)


# ---------------------------------------------------------------------------
# rho primitives (rotating frame)
# ---------------------------------------------------------------------------

def rho_apply_U(cc: CellConstants, rr, ri, s):
    """Unnormalized Kraus update ``rho'' = (C + s R) rho (C + s R)^dag``.

    rr/ri: [B,D,D]; s: [B] = signal / A (reference: model.py:172-187).
    """
    sb = s[:, None, None]
    Ur = cc.Cr[None] + sb * cc.Rr[None]
    Ui = cc.Ci[None] + sb * cc.Ri[None]
    mr, mi = cmatmul(Ur, Ui, rr, ri)
    return cmatmul_adj_right(mr, mi, Ur, Ui)


def rho_expectation(cc: CellConstants, rr, ri):
    """``<x> = Re tr[(R + R^dag) rho~]`` — frame-invariant
    (reference: model.py:189-196)."""
    return (jnp.einsum('ik,bki->b', cc.Xr, rr, precision='highest')
            - jnp.einsum('ik,bki->b', cc.Xi, ri, precision='highest'))


def normalize_rho(rr, ri, eps: float):
    """Divide by the (real) trace, floored at eps (reference: model.py:198-203)."""
    tr = jnp.trace(rr, axis1=-2, axis2=-1)
    inv = 1.0 / jnp.maximum(tr, eps)
    inv = inv[:, None, None]
    return rr * inv, ri * inv


def rotate_rho(cc: CellConstants, rr, ri):
    """Advance the rotating frame one step: ``rho~ <- rho~ .* Phi``."""
    return cmul(rr, ri, cc.phi_c[None], cc.phi_s[None])


# ---------------------------------------------------------------------------
# psi primitives (rotating frame)
# ---------------------------------------------------------------------------

def psi_apply_update(cc: CellConstants, pr, pi, s):
    """First-order update without forming U (reference: model.py:300-317):
    ``psi'' = psi + (-(sigma^2 dt/2) K + s R) psi`` in the rotating frame.

    pr/pi: [B,D]; s: [B] = signal / A. Uses the identity
    ``-(sigma^2 dt/2) K = C - I`` so psi and rho share the same constants.
    """
    # (C - I) psi  ==  -(sigma^2 dt / 2) K psi
    d = cc.Cr.shape[-1]
    eye = jnp.eye(d, dtype=cc.Cr.dtype)
    cm_r = cc.Cr - eye
    cm_i = cc.Ci
    dr1, di1 = apply_matrix(cm_r, cm_i, pr, pi)
    rr_, ri_ = apply_matrix(cc.Rr, cc.Ri, pr, pi)
    sb = s[:, None]
    return pr + dr1 + sb * rr_, pi + di1 + sb * ri_


def psi_expectation(cc: CellConstants, pr, pi):
    """``<x> = 2 Re <psi|R|psi>`` (reference: model.py:319-325)."""
    rr_, ri_ = apply_matrix(cc.Rr, cc.Ri, pr, pi)
    # Re(conj(a) b) = a.re b.re + a.im b.im
    return 2.0 * jnp.sum(pr * rr_ + pi * ri_, axis=-1)


def normalize_psi(pr, pi, eps: float):
    """L2 normalize with eps floor (reference: model.py:327-334)."""
    sq = jnp.sum(pr * pr + pi * pi, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, eps))
    return pr * inv, pi * inv


def rotate_psi(cc: CellConstants, pr, pi):
    """``psi~ <- conj(p) .* psi~`` with p = exp(i f dt)."""
    return (pr * cc.p_c[None] + pi * cc.p_s[None],
            pi * cc.p_c[None] - pr * cc.p_s[None])


# ---------------------------------------------------------------------------
# Loss increment
# ---------------------------------------------------------------------------

def nll_increment(e, s, log_eps: float):
    """``-log(1 + <x> * signal / A)`` (reference: model.py:169-170, 293-294).

    The reference silently NaNs when the argument is <= 0; we clamp at
    `log_eps` when it is > 0 (cfg.log_eps <= 0 reproduces reference
    behaviour).
    """
    arg = 1.0 + e * s
    if log_eps > 0:
        arg = jnp.maximum(arg, log_eps)
    return -jnp.log(arg)


# ---------------------------------------------------------------------------
# Composite scan steps (rotating frame)
# ---------------------------------------------------------------------------

def rho_loss_step(cc: CellConstants, cfg: CMPSConfig, carry, inc):
    """One hot-loop step: update -> loss -> normalize -> rotate
    (reference: model.py:152-158; note the expectation in the loss uses the
    *unnormalized, post-update* state exactly as the reference does)."""
    rr, ri, loss = carry
    s = inc / cc.A
    rr2, ri2 = rho_apply_U(cc, rr, ri, s)
    e = rho_expectation(cc, rr2, ri2)
    loss = loss + nll_increment(e, s, cfg.log_eps)
    rr2, ri2 = normalize_rho(rr2, ri2, cfg.norm_eps)
    rr2, ri2 = rotate_rho(cc, rr2, ri2)
    return (rr2, ri2, loss)


def rho_evolve_step(cc: CellConstants, cfg: CMPSConfig, carry, inc):
    """Update without loss (reference: model.py:144-150). Returns the carry
    plus the normalized pre-rotation state (frame n) for trajectory APIs."""
    rr, ri, loss = carry
    s = inc / cc.A
    rr2, ri2 = rho_apply_U(cc, rr, ri, s)
    rr2, ri2 = normalize_rho(rr2, ri2, cfg.norm_eps)
    out = (rr2, ri2)
    rr2, ri2 = rotate_rho(cc, rr2, ri2)
    return (rr2, ri2, loss), out


def rho_sample_step(cc: CellConstants, cfg: CMPSConfig, carry, noise):
    """Euler–Maruyama sampling step (reference: model.py:160-167):
    increment = <x>(rho) dt + noise; ancilla conditioned on the realized
    increment. Returns (carry, (increment, state_frame_n))."""
    rr, ri = carry
    e = rho_expectation(cc, rr, ri)
    inc = e * cfg.delta_t + noise
    s = inc / cc.A
    rr2, ri2 = rho_apply_U(cc, rr, ri, s)
    rr2, ri2 = normalize_rho(rr2, ri2, cfg.norm_eps)
    state = (rr2, ri2)
    rr2, ri2 = rotate_rho(cc, rr2, ri2)
    return (rr2, ri2), (inc, state)


def psi_loss_step(cc: CellConstants, cfg: CMPSConfig, carry, inc):
    """(reference: model.py:276-282)."""
    pr, pi, loss = carry
    s = inc / cc.A
    pr2, pi2 = psi_apply_update(cc, pr, pi, s)
    e = psi_expectation(cc, pr2, pi2)
    loss = loss + nll_increment(e, s, cfg.log_eps)
    pr2, pi2 = normalize_psi(pr2, pi2, cfg.norm_eps)
    pr2, pi2 = rotate_psi(cc, pr2, pi2)
    return (pr2, pi2, loss)


def psi_evolve_step(cc: CellConstants, cfg: CMPSConfig, carry, inc):
    """(reference: model.py:269-274)."""
    pr, pi, loss = carry
    s = inc / cc.A
    pr2, pi2 = psi_apply_update(cc, pr, pi, s)
    pr2, pi2 = normalize_psi(pr2, pi2, cfg.norm_eps)
    out = (pr2, pi2)
    pr2, pi2 = rotate_psi(cc, pr2, pi2)
    return (pr2, pi2, loss), out


def psi_sample_step(cc: CellConstants, cfg: CMPSConfig, carry, noise):
    """(reference: model.py:284-291)."""
    pr, pi = carry
    e = psi_expectation(cc, pr, pi)
    inc = e * cfg.delta_t + noise
    s = inc / cc.A
    pr2, pi2 = psi_apply_update(cc, pr, pi, s)
    pr2, pi2 = normalize_psi(pr2, pi2, cfg.norm_eps)
    state = (pr2, pi2)
    pr2, pi2 = rotate_psi(cc, pr2, pi2)
    return (pr2, pi2), (inc, state)


def rho_factor_loss_step(cc: CellConstants, cfg: CMPSConfig, carry, inc,
                         reduce=None):
    """One hot-loop step in purification-factor form (rho = G^dag G evolves
    as G <- G U^dag — exact, see ops/pallas_scan.py design notes). Shared
    by core.rho_nll_factor, the temporal pipeline, and (via `reduce`) the
    rank-sharded variants. carry: (gr, gi [B, r, D], loss [B]).

    `reduce` (optional): hook applied to the stacked [2, B] e/tr partial
    sums before use — the purification-rank-sharded paths pass a psum
    over their model axis to make the reductions global
    (rank_parallel.rho_nll_rank_sharded, the TP x PP pipeline); None
    keeps the local sums (the single-device semantics). This is the ONE
    transcription of the physics-critical step."""
    import functools as _ft
    mm = _ft.partial(jnp.matmul, precision="highest")
    gr, gi, loss = carry
    s = (inc / cc.A)[:, None, None]
    cdr, cdi = cc.Cr.T, -cc.Ci.T
    rdr, rdi = cc.Rr.T, -cc.Ri.T
    a1r = mm(gr, cdr) - mm(gi, cdi)
    a1i = mm(gr, cdi) + mm(gi, cdr)
    a2r = mm(gr, rdr) - mm(gi, rdi)
    a2i = mm(gr, rdi) + mm(gi, rdr)
    yr = a1r + s * a2r
    yi = a1i + s * a2i
    # e = Re tr(X rho'') = sum Re(G'' . conj(G'' @ X))
    gxr = mm(yr, cc.Xr) - mm(yi, cc.Xi)
    gxi = mm(yr, cc.Xi) + mm(yi, cc.Xr)
    part = jnp.stack([
        jnp.sum(yr * gxr + yi * gxi, axis=(1, 2)),
        jnp.sum(yr * yr + yi * yi, axis=(1, 2))])
    if reduce is not None:
        part = reduce(part)
    e, tr = part[0], part[1]
    loss = loss + nll_increment(e, s[:, 0, 0], cfg.log_eps)
    inv = jax.lax.rsqrt(jnp.maximum(tr, cfg.norm_eps))[:, None, None]
    yr = yr * inv
    yi = yi * inv
    # rotate: G <- G P (column scale by exp(i f dt))
    nr = yr * cc.p_c - yi * cc.p_s
    ni = yr * cc.p_s + yi * cc.p_c
    return (nr, ni, loss)


def rho_factor_state0(params, cfg: CMPSConfig, b: int, reduce=None):
    """Initial purification factor broadcast to [b, rank, D], normalized
    to unit trace. `reduce` (optional): hook on the scalar Frobenius
    trace — rank-sharded variants psum it over their model axis so the
    LOCAL rows are normalized by the GLOBAL trace; None is the
    single-device semantics (reference: model.py:57-66 _rho_init)."""
    wr, wi = params.Wx, params.Wy
    tr0 = jnp.sum(wr * wr + wi * wi)
    if reduce is not None:
        tr0 = reduce(tr0)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    return (jnp.broadcast_to(wr * inv0, (b,) + wr.shape),
            jnp.broadcast_to(wi * inv0, (b,) + wi.shape))


# ---------------------------------------------------------------------------
# Lab-frame single steps — the reference-parity/test seam
# ---------------------------------------------------------------------------

def _lab_Rt(params, t):
    """``Rt = diag(e^{i f t}) R diag(e^{-i f t}) = R .* E``,
    ``E_ij = e^{i (f_i - f_j) t}`` (reference: model.py:178-179)."""
    Rr, Ri = effective_R(params)
    f = params.freqs
    df = (f[:, None] - f[None, :]) * t
    return cmul(Rr, Ri, jnp.cos(df), jnp.sin(df))


def lab_update_ancilla_rho(params, cfg: CMPSConfig, rr, ri, signal, t):
    """Direct transcription of the reference update (model.py:172-187), with
    explicit phases at time t. Used in tests to pin rotating-frame
    equivalence. rr/ri: [B,D,D]; signal: [B] (raw, divided by A here)."""
    Rtr, Rti = _lab_Rt(params, t)
    Ktr, Kti = gram_adj(Rtr, Rti)
    half = 0.5 * (cfg.sigma ** 2) * cfg.delta_t
    d = Rtr.shape[-1]
    eye = jnp.eye(d, dtype=Rtr.dtype)
    s = (signal / params.A)[:, None, None]
    Ur = (eye - half * Ktr)[None] + s * Rtr[None]
    Ui = (-half * Kti)[None] + s * Rti[None]
    mr, mi = cmatmul(Ur, Ui, rr, ri)
    return cmatmul_adj_right(mr, mi, Ur, Ui)


def lab_update_ancilla_psi(params, cfg: CMPSConfig, pr, pi, signal, t):
    """Direct transcription of the reference psi update (model.py:300-317)."""
    Rr, Ri = effective_R(params)
    Kr, Ki = gram_adj(Rr, Ri)
    f = params.freqs
    c, sn = jnp.cos(f * t), jnp.sin(f * t)   # phases = c + i sn
    # Upsi = psi * conj(phases)
    ur = pr * c[None] + pi * sn[None]
    ui = pi * c[None] - pr * sn[None]
    RUr, RUi = apply_matrix(Rr, Ri, ur, ui)
    KUr, KUi = apply_matrix(Kr, Ki, ur, ui)
    half = 0.5 * (cfg.sigma ** 2) * cfg.delta_t
    s = (signal / params.A)[:, None]
    dUr = -half * KUr + s * RUr
    dUi = -half * KUi + s * RUi
    # delta_psi = phases * delta_Upsi
    dpr = dUr * c[None] - dUi * sn[None]
    dpi = dUr * sn[None] + dUi * c[None]
    return pr + dpr, pi + dpi


def lab_expectation_rho(params, rr, ri, t):
    """(reference: model.py:189-196)."""
    Rtr, Rti = _lab_Rt(params, t)
    Xr = Rtr + Rtr.T
    Xi = Rti - Rti.T
    return (jnp.einsum('ik,bki->b', Xr, rr, precision='highest')
            - jnp.einsum('ik,bki->b', Xi, ri, precision='highest'))


def lab_expectation_psi(params, pr, pi, t):
    """(reference: model.py:319-325)."""
    Rr, Ri = effective_R(params)
    f = params.freqs
    c, sn = jnp.cos(f * t), jnp.sin(f * t)
    ur = pr * c[None] + pi * sn[None]
    ui = pi * c[None] - pr * sn[None]
    rr_, ri_ = apply_matrix(Rr, Ri, ur, ui)
    return 2.0 * jnp.sum(ur * rr_ + ui * ri_, axis=-1)
