"""Functional cMPS model API: losses, samplers, trajectory diagnostics.

Pure functions over parameter pytrees — the JAX-native equivalent of the
reference's graph-building class methods (reference: model.py:55-334).
Time is a `lax.scan`; batch is native batching; BPTT memory over T = 2^16 is
bounded by a scan-of-scans with `jax.checkpoint` on the inner chunk (the
reference fully unrolls the 65535-step fold: model.py:140-141).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CMPSConfig
from ..ops.complexing import cadjoint, cmatmul
from . import cell
from .cell import make_constants


# ---------------------------------------------------------------------------
# Initial states
# ---------------------------------------------------------------------------

def psi0(params, cfg: CMPSConfig):
    """Normalized initial pure state [D] (reference: model.py:214-222)."""
    pr, pi = params.psi_x[None, :], params.psi_y[None, :]
    pr, pi = cell.normalize_psi(pr, pi, cfg.norm_eps)
    return pr[0], pi[0]


def rho0(params, cfg: CMPSConfig):
    """``rho_0 = W^dag W / tr`` [D,D] (reference: model.py:118-130)."""
    wr, wi = params.Wx, params.Wy
    ar, ai = cadjoint(wr, wi)
    rr, ri = cmatmul(ar, ai, wr, wi)
    tr = jnp.trace(rr)
    return rr / tr, ri / tr


def _tile(x, n):
    return jnp.broadcast_to(x[None], (n,) + x.shape)


# ---------------------------------------------------------------------------
# Chunked remat scan over time
# ---------------------------------------------------------------------------

def chunked_scan(step, carry, xs, chunk: int, remat: bool = True):
    """Scan `step` over leading axis of `xs` with bounded-BPTT chunking.

    Full chunks run as an outer scan of `jax.checkpoint`-wrapped inner scans
    (memory O(T/chunk + chunk) instead of O(T)); the remainder runs as a
    plain scan so no masking is needed.
    """
    T = xs.shape[0]

    def plain(carry, xs_):
        return jax.lax.scan(lambda c, x: (step(c, x), None), carry, xs_)[0]

    if chunk is None or chunk <= 1 or T <= chunk:
        return plain(carry, xs)

    n_full = T // chunk
    inner = jax.checkpoint(plain) if remat else plain
    main = xs[: n_full * chunk].reshape((n_full, chunk) + xs.shape[1:])
    carry = jax.lax.scan(lambda c, xc: (inner(c, xc), None), carry, main)[0]
    if T % chunk:
        carry = plain(carry, xs[n_full * chunk:])
    return carry


def _increments(signals):
    """Waveform -> time-major increments [T-1, B]
    (reference: model.py:138-139)."""
    return (signals[:, 1:] - signals[:, :-1]).T


# ---------------------------------------------------------------------------
# NLL losses
# ---------------------------------------------------------------------------

def rho_nll(params, cfg: CMPSConfig, signals):
    """Mean NLL of a batch of waveforms [B,T] under the mixed-state model
    (reference: model.py:132-142)."""
    cc = make_constants(params, cfg)
    incs = _increments(signals)
    B = signals.shape[0]
    rr, ri = rho0(params, cfg)
    carry = (_tile(rr, B), _tile(ri, B), jnp.zeros((B,), signals.dtype))
    step = partial(cell.rho_loss_step, cc, cfg)
    _, _, loss = chunked_scan(step, carry, incs, cfg.scan_chunk)
    return jnp.mean(loss)


def rho_nll_factor(params, cfg: CMPSConfig, signals):
    """Mean NLL under the mixed-state model, evolving the purification
    factor G (rho = G^dag G — the exact form of the reference's
    rho_0 = W^dag W / tr, model.py:118-130) instead of rho itself.

    Mathematically identical to `rho_nll` (the Kraus update factorizes
    exactly: rho'' = U rho U^dag <=> G'' = G U^dag) at half the matmul
    FLOPs and with better conditioning; pinned equal by tests. This is the
    training-default implementation; `rho_nll` remains as the literal
    reference-shaped transcription.
    """
    cc = make_constants(params, cfg)
    incs = _increments(signals)                       # [T-1, B]
    B = signals.shape[0]
    wr, wi = params.Wx, params.Wy
    tr0 = jnp.sum(wr * wr + wi * wi)
    inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
    gr = _tile(wr * inv0, B)                          # [B, r, D]
    gi = _tile(wi * inv0, B)
    step = partial(cell.rho_factor_loss_step, cc, cfg)
    carry = (gr, gi, jnp.zeros((B,), signals.dtype))
    _, _, loss = chunked_scan(step, carry, incs, cfg.scan_chunk)
    return jnp.mean(loss)


def psi_nll(params, cfg: CMPSConfig, signals):
    """Mean NLL under the pure-state model (reference: model.py:257-267)."""
    cc = make_constants(params, cfg)
    incs = _increments(signals)
    B = signals.shape[0]
    pr, pi = psi0(params, cfg)
    carry = (_tile(pr, B), _tile(pi, B), jnp.zeros((B,), signals.dtype))
    step = partial(cell.psi_loss_step, cc, cfg)
    _, _, loss = chunked_scan(step, carry, incs, cfg.scan_chunk)
    return jnp.mean(loss)


def regularized_loss(nll, params, cfg: CMPSConfig):
    """``total = nll + h_reg ||freqs||^2 + r_reg ||R||^2``
    (reference: train.py:55-60)."""
    Rr, Ri = cell.effective_R(params)
    r_sq = jnp.sum(Rr * Rr + Ri * Ri)
    h_sq = jnp.sum(params.freqs ** 2)
    return nll + cfg.h_reg * h_sq + cfg.r_reg * r_sq, (h_sq, r_sq)


# ---------------------------------------------------------------------------
# Sampling (Euler–Maruyama SDE, reference: model.py:103-112, 242-251)
# ---------------------------------------------------------------------------

def _sample_noise(cfg: CMPSConfig, key, num_samples: int, length: int, temp):
    std = cfg.sigma * jnp.sqrt(temp * cfg.delta_t)
    return std * jax.random.normal(key, (length, num_samples), jnp.float32)


def sample_rho_with_noise(params, cfg: CMPSConfig, noise):
    """Generate waveforms [N, T] from given noise [T, N] (the SDE driving
    terms). Carry-only scan — unlike the reference, intermediate ancillas
    are not materialized (reference TODO at model.py:110)."""
    cc = make_constants(params, cfg)
    num_samples = noise.shape[1]
    rr, ri = rho0(params, cfg)
    carry = (_tile(rr, num_samples), _tile(ri, num_samples))

    def step(c, z):
        c2, (inc, _state) = cell.rho_sample_step(cc, cfg, c, z)
        return c2, inc

    _, incs = jax.lax.scan(step, carry, noise)
    return cc.A * jnp.cumsum(incs, axis=0).T


def sample_rho(params, cfg: CMPSConfig, key, num_samples: int, length: int,
               temp=1.0):
    """(reference: model.py:103-112)"""
    noise = _sample_noise(cfg, key, num_samples, length, temp)
    return sample_rho_with_noise(params, cfg, noise)


def sample_psi_with_noise(params, cfg: CMPSConfig, noise):
    cc = make_constants(params, cfg)
    num_samples = noise.shape[1]
    pr, pi = psi0(params, cfg)
    carry = (_tile(pr, num_samples), _tile(pi, num_samples))

    def step(c, z):
        c2, (inc, _state) = cell.psi_sample_step(cc, cfg, c, z)
        return c2, inc

    _, incs = jax.lax.scan(step, carry, noise)
    return cc.A * jnp.cumsum(incs, axis=0).T


def sample_psi(params, cfg: CMPSConfig, key, num_samples: int, length: int,
               temp=1.0):
    """(reference: model.py:242-251)"""
    noise = _sample_noise(cfg, key, num_samples, length, temp)
    return sample_psi_with_noise(params, cfg, noise)


# ---------------------------------------------------------------------------
# Trajectory diagnostics (reference: model.py:76-101, 231-240)
# ---------------------------------------------------------------------------

def _lab_rotate_rho_traj(params, cfg: CMPSConfig, rr, ri):
    """Back-rotate a rotating-frame rho trajectory [T,B,D,D] into the lab
    frame: rho_lab(t_n) = rho~ .* E(t_n), E_ij = exp(i (f_i - f_j) n dt)."""
    T = rr.shape[0]
    f = params.freqs
    t = jnp.arange(T, dtype=jnp.float32) * cfg.delta_t
    df = f[:, None] - f[None, :]
    ang = t[:, None, None] * df[None]            # [T,D,D]
    c, s = jnp.cos(ang), jnp.sin(ang)
    c, s = c[:, None], s[:, None]                # broadcast over batch
    return rr * c - ri * s, rr * s + ri * c


def _lab_rotate_psi_traj(params, cfg: CMPSConfig, pr, pi):
    """psi_lab(t_n) = phases(t_n) .* psi~, phases = exp(i f t_n)."""
    T = pr.shape[0]
    t = jnp.arange(T, dtype=jnp.float32) * cfg.delta_t
    ang = t[:, None] * params.freqs[None]        # [T,D]
    c, s = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    return pr * c - pi * s, pr * s + pi * c


def rho_evolve_with_data(params, cfg: CMPSConfig, signals):
    """Full rho trajectory [B, T-1, D, D] (as a real/imag pair) under a data
    batch [B,T] (reference: model.py:76-85)."""
    cc = make_constants(params, cfg)
    incs = _increments(signals)
    B = signals.shape[0]
    rr, ri = rho0(params, cfg)
    carry = (_tile(rr, B), _tile(ri, B), jnp.zeros((B,), signals.dtype))
    step = partial(cell.rho_evolve_step, cc, cfg)
    _, (tr_r, tr_i) = jax.lax.scan(step, carry, incs)
    tr_r, tr_i = _lab_rotate_rho_traj(params, cfg, tr_r, tr_i)
    return jnp.swapaxes(tr_r, 0, 1), jnp.swapaxes(tr_i, 0, 1)


def psi_evolve_with_data(params, cfg: CMPSConfig, signals):
    """Full psi trajectory [B, T-1, D] pair (reference: model.py:231-240)."""
    cc = make_constants(params, cfg)
    incs = _increments(signals)
    B = signals.shape[0]
    pr, pi = psi0(params, cfg)
    carry = (_tile(pr, B), _tile(pi, B), jnp.zeros((B,), signals.dtype))
    step = partial(cell.psi_evolve_step, cc, cfg)
    _, (tr_r, tr_i) = jax.lax.scan(step, carry, incs)
    tr_r, tr_i = _lab_rotate_psi_traj(params, cfg, tr_r, tr_i)
    return jnp.swapaxes(tr_r, 0, 1), jnp.swapaxes(tr_i, 0, 1)


def rho_evolve_with_sampling(params, cfg: CMPSConfig, key, num_samples: int,
                             length: int, temp=1.0):
    """rho trajectory under ancestral sampling [N, length, D, D] pair
    (reference: model.py:87-93)."""
    cc = make_constants(params, cfg)
    noise = _sample_noise(cfg, key, num_samples, length, temp)
    rr, ri = rho0(params, cfg)
    carry = (_tile(rr, num_samples), _tile(ri, num_samples))

    def step(c, z):
        c2, (_inc, state) = cell.rho_sample_step(cc, cfg, c, z)
        return c2, state

    _, (tr_r, tr_i) = jax.lax.scan(step, carry, noise)
    tr_r, tr_i = _lab_rotate_rho_traj(params, cfg, tr_r, tr_i)
    return jnp.swapaxes(tr_r, 0, 1), jnp.swapaxes(tr_i, 0, 1)


def purity(params, cfg: CMPSConfig, key, num_samples: int, length: int,
           temp=1.0):
    """``tr(rho^2)`` along sampled trajectories [N, length]
    (reference: model.py:95-101). Frame-invariant, so computed directly on
    the rotating-frame states."""
    cc = make_constants(params, cfg)
    noise = _sample_noise(cfg, key, num_samples, length, temp)
    rr, ri = rho0(params, cfg)
    carry = (_tile(rr, num_samples), _tile(ri, num_samples))

    def step(c, z):
        c2, (_inc, (sr, si)) = cell.rho_sample_step(cc, cfg, c, z)
        p = (jnp.einsum('bij,bji->b', sr, sr, precision='highest')
             - jnp.einsum('bij,bji->b', si, si, precision='highest'))
        return c2, p

    _, p = jax.lax.scan(step, carry, noise)
    return p.T


# ---------------------------------------------------------------------------
# Parallel-in-time NLL (associative scan over transfer operators)
# ---------------------------------------------------------------------------

def factor_g0(params, cfg: CMPSConfig, B: int):
    """Initial purification factor [B, r, D]: W-based for the rho family,
    rank-1 psi^T row for the psi family (a pure state is exactly a rank-1
    factor: rho = psi psi^dag = G^dag G with G = psi^dag)."""
    if hasattr(params, "Wx"):
        wr, wi = params.Wx, params.Wy
        tr0 = jnp.sum(wr * wr + wi * wi)
        inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
        return _tile(wr * inv0, B), _tile(wi * inv0, B)
    pr, pi = psi0(params, cfg)
    # G = psi^dag as a single row: G_{0d} = conj(psi_d)
    return _tile(pr[None, :], B), _tile(-pi[None, :], B)


def pscan_operators(cc):
    """Transfer-operator constants for the parallel-in-time formulations:
    M(s) = (C + s R)^dag P with the frame rotation P folded in, and the
    conjugated expectation operator X' = P^dag X P (the reference's
    expectation is taken before the rotation). Shared with
    parallel/time_pscan.py."""
    pr_, pi_ = cc.p_c, cc.p_s
    cdr = cc.Cr.T * pr_ - (-cc.Ci.T) * pi_
    cdi = cc.Cr.T * pi_ + (-cc.Ci.T) * pr_
    rdr = cc.Rr.T * pr_ - (-cc.Ri.T) * pi_
    rdi = cc.Rr.T * pi_ + (-cc.Ri.T) * pr_
    xpr = cc.Xr * cc.phi_c - cc.Xi * cc.phi_s
    xpi = cc.Xr * cc.phi_s + cc.Xi * cc.phi_c
    return (cdr, cdi, rdr, rdi, xpr, xpi)


def pscan_combine(a, b):
    """Max-abs rescaled complex matrix-product combine for associative
    scans over transfer operators (keeps 65k-step products in fp32
    range; the accumulated log-scale makes results exact)."""
    mm = partial(jnp.matmul, precision="highest")
    ar, ai, asig = a
    br, bi, bsig = b
    cr = mm(ar, br) - mm(ai, bi)
    ci = mm(ar, bi) + mm(ai, br)
    scale = jnp.maximum(
        jnp.max(jnp.maximum(jnp.abs(cr), jnp.abs(ci)), axis=(-2, -1),
                keepdims=True), 1e-30)
    return cr / scale, ci / scale, asig + bsig + jnp.log(scale[..., 0, 0])


def rho_nll_pscan(params, cfg: CMPSConfig, signals, time_chunk: int = 1024):
    """Mean NLL via `lax.associative_scan` over per-step transfer operators
    — O(log T) depth instead of T sequential steps (SURVEY.md §2.4: "an
    associative scan over unnormalized transfer operators with per-chunk
    renormalization").

    The purification factor makes this cheap: one step is
    ``G <- G (U_t^dag P)`` with the constant frame rotation P folded in, so
    the whole evolution is a PREFIX PRODUCT of D x D complex matrices
    ``Q_t = M_1 ... M_t`` — batched MXU-saturating matmuls at log depth,
    not D^2 x D^2 superoperators. Per-combine max-abs rescaling keeps fp32
    in range (65k-step raw products overflow); the loss is reconstructed
    exactly from log-scale *differences*:

        e_t = ehat_{X'}(G_0 Q_t) / trhat(G_0 Q_{t-1}) * exp(2(sig_t - sig_{t-1}))

    with X' = P^dag X P absorbing that the reference's expectation is taken
    *before* the frame rotation. Values/gradients match the sequential
    factor scan (pinned by tests). Memory is bounded by `time_chunk`
    (outer chunks stay sequential).

    Measured (v5e, D=8, B=8, T=65536): forward parity with the sequential
    factor scan (~210 ms both) — the D x D operands pad to (8,128) tiles
    (16x expansion at D=8), so the log-depth matmuls are HBM-bound. Its
    niche is depth, not single-chip throughput: the per-chunk prefix
    products are the building block for cross-chip time sharding; the
    fused Pallas kernels (ops/pallas_grad.py) remain the single-chip
    training path.

    Differentiable with bounded memory at any T: each `time_chunk`-sized
    chunk body is `jax.checkpoint`-wrapped, so reverse-mode recomputes one
    chunk's associative-scan intermediates at a time (live memory
    O(time_chunk) + carries O(T / time_chunk)) instead of materializing
    the whole padded trajectory (pinned by a T=8192 gradient test).
    """
    cc = make_constants(params, cfg)
    incs = _increments(signals)                       # [T-1, B]
    B = signals.shape[0]
    n_steps = incs.shape[0]
    g0r, g0i = factor_g0(params, cfg, B)              # [B, r, D]

    cdr, cdi, rdr, rdi, xpr, xpi = pscan_operators(cc)
    mm = partial(jnp.matmul, precision="highest")
    combine = pscan_combine

    def ehat_trhat(gr, gi):
        """[..., r, D] factor -> (Re tr(X' G^dag G), ||G||_F^2)."""
        gxr = mm(gr, xpr) - mm(gi, xpi)
        gxi = mm(gr, xpi) + mm(gi, xpr)
        e = jnp.sum(gr * gxr + gi * gxi, axis=(-2, -1))
        tr = jnp.sum(gr * gr + gi * gi, axis=(-2, -1))
        return e, tr

    def chunk_step(carry, s_chunk):
        """s_chunk: [Tc, B] signals/A. carry: normalized factor pair."""
        gr, gi, loss = carry
        sb = s_chunk[:, :, None, None]
        mr = cdr[None, None] + sb * rdr[None, None]   # [Tc, B, D, D]
        mi = cdi[None, None] + sb * rdi[None, None]
        sig0 = jnp.zeros(s_chunk.shape)
        qr, qi, sig = jax.lax.associative_scan(combine, (mr, mi, sig0))
        # all states G_t = G_0 Q_t (times exp(sig_t))
        em = partial(jnp.einsum, precision="highest")
        gtr = em('brd,tbde->tbre', gr, qr) - em('brd,tbde->tbre', gi, qi)
        gti = em('brd,tbde->tbre', gr, qi) + em('brd,tbde->tbre', gi, qr)
        ehat, trhat = ehat_trhat(gtr, gti)            # [Tc, B]
        trhat_prev = jnp.concatenate(
            [jnp.ones_like(trhat[:1]), trhat[:-1]], axis=0)
        sig_prev = jnp.concatenate(
            [jnp.zeros_like(sig[:1]), sig[:-1]], axis=0)
        e = (ehat / jnp.maximum(trhat_prev, cfg.norm_eps)
             * jnp.exp(2.0 * (sig - sig_prev)))
        arg = 1.0 + e * s_chunk
        if cfg.log_eps > 0:
            arg = jnp.maximum(arg, cfg.log_eps)
        loss = loss + jnp.sum(-jnp.log(arg), axis=0)
        # next-chunk state: normalize the final factor (scale cancels)
        inv = jax.lax.rsqrt(jnp.maximum(trhat[-1], cfg.norm_eps))
        gr2 = gtr[-1] * inv[:, None, None]
        gi2 = gti[-1] * inv[:, None, None]
        return (gr2, gi2, loss), None

    s_all = incs / cc.A                               # [T-1, B]
    if n_steps == 0:
        return jnp.zeros((), signals.dtype)
    Tc = min(time_chunk, n_steps)
    n_full = n_steps // Tc
    carry = (g0r, g0i, jnp.zeros((B,), signals.dtype))
    # remat per chunk: reverse-mode recomputes one chunk's associative-scan
    # intermediates at a time instead of retaining all of them
    inner = jax.checkpoint(chunk_step)
    if n_full:
        main = s_all[: n_full * Tc].reshape(n_full, Tc, B)
        carry, _ = jax.lax.scan(inner, carry, main)
    if n_steps % Tc:
        carry, _ = chunk_step(carry, s_all[n_full * Tc:])
    return jnp.mean(carry[2])


def psi_nll_pscan(params, cfg: CMPSConfig, signals, time_chunk: int = 4096):
    """Parallel-in-time NLL for the pure-state model: identical machinery
    with the rank-1 factor (see _factor_g0). Same value as psi_nll.

    The default ``time_chunk`` is 4x the rho default deliberately: the
    chunk memory footprint is dominated by the per-step factor states
    [Tc, B, r, D], and the psi family's rank is r=1 vs the rho family's
    r = initial_rank (default D) — a psi chunk of 4096 costs about the
    same memory as a rho chunk of 1024 at the D=8 defaults. Both bodies
    are `jax.checkpoint`-wrapped, so either default is safe at any T."""
    return rho_nll_pscan(params, cfg, signals, time_chunk=time_chunk)
