"""Cross-chip time-sharded NLL — blockwise sequence parallelism.

The strongest form of SURVEY.md §2.4's time-sharding plan: each of S chips
owns a contiguous chunk of the waveform; all chips work FULLY in parallel
(no pipeline bubbles) because the cMPS evolution in purification-factor
form is a product of per-step D x D transfer matrices:

  1. each chip runs a local `associative_scan` over its chunk's transfer
     matrices (max-abs rescaled, as core.rho_nll_pscan);
  2. ONE `all_gather` of the S chunk-products (tiny: S x [B, D, D]) rides
     ICI; every chip forms its entry operator as the exclusive prefix of
     its predecessors' chunk products;
  3. each chip applies `G_0 @ entry @ local_prefix_t` to get all of its
     states, evaluates its slice of the loss locally (the log-scale
     differences make the per-step normalization ratios exact across
     chunk boundaries), and the per-chip partial losses are `psum`'d.

Semantics are identical to core.rho_nll_factor (pinned by tests on the
virtual CPU mesh). Contrast with parallel/time_pipeline.py: the pipeline
streams the exact sequential recursion (arbitrary step nonlinearity, M/(M+S-1)
efficiency); this module exploits the linear-transfer structure for 100%
parallel efficiency at the cost of one all-gather and rescaled arithmetic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import CMPSConfig
from ..models.cell import make_constants
from .time_pipeline import TIME_AXIS, make_time_mesh  # noqa: F401

_mm = partial(jnp.matmul, precision="highest")


def _combine(a, b):
    ar, ai, asig = a
    br, bi, bsig = b
    cr = _mm(ar, br) - _mm(ai, bi)
    ci = _mm(ar, bi) + _mm(ai, br)
    scale = jnp.maximum(
        jnp.max(jnp.maximum(jnp.abs(cr), jnp.abs(ci)), axis=(-2, -1),
                keepdims=True), 1e-30)
    return cr / scale, ci / scale, asig + bsig + jnp.log(scale[..., 0, 0])


def rho_nll_time_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = TIME_AXIS):
    """Mean NLL of waveforms [B, T] with the time axis sharded over `mesh`
    (semantics of core.rho_nll_factor / reference model.py:132-142). Also
    accepts PsiParams (rank-1 factor; see core._factor_g0)."""
    B, T = signals.shape
    S = mesh.devices.size
    n_steps = T - 1
    if n_steps % S:
        raise ValueError(f"T-1={n_steps} steps not divisible by {S} chips")

    cc = make_constants(params, cfg)
    from ..models.core import _factor_g0
    g0r, g0i = _factor_g0(params, cfg, B)

    # constant step matrices with the frame rotation folded in (see
    # core.rho_nll_pscan): M(s) = (C + s R)^dag P;  X' = P^dag X P
    pr_, pi_ = cc.p_c, cc.p_s
    cdr = cc.Cr.T * pr_ - (-cc.Ci.T) * pi_
    cdi = cc.Cr.T * pi_ + (-cc.Ci.T) * pr_
    rdr = cc.Rr.T * pr_ - (-cc.Ri.T) * pi_
    rdi = cc.Rr.T * pi_ + (-cc.Ri.T) * pr_
    xpr = cc.Xr * cc.phi_c - cc.Xi * cc.phi_s
    xpi = cc.Xr * cc.phi_s + cc.Xi * cc.phi_c

    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A    # [T-1, B]

    def local(s_chunk):
        s_chunk = s_chunk                                  # [Tc, B]
        idx = jax.lax.axis_index(axis)
        sb = s_chunk[:, :, None, None]
        mr = cdr[None, None] + sb * rdr[None, None]        # [Tc, B, D, D]
        mi = cdi[None, None] + sb * rdi[None, None]
        sig0 = jnp.zeros(s_chunk.shape)
        qr, qi, sig = jax.lax.associative_scan(_combine, (mr, mi, sig0))

        # chunk product -> all chips (one ICI collective)
        last = (qr[-1], qi[-1], sig[-1])                   # [B, D, D] x2, [B]
        allr = jax.lax.all_gather(last[0], axis)           # [S, B, D, D]
        alli = jax.lax.all_gather(last[1], axis)
        allsig = jax.lax.all_gather(last[2], axis)

        # exclusive prefix of predecessors' chunk products (S is tiny)
        d = qr.shape[-1]
        er = jnp.broadcast_to(jnp.eye(d), (B, d, d))
        ei = jnp.zeros((B, d, d))
        esig = jnp.zeros((B,))

        def pref_step(carry, x):
            out = carry
            carry = _combine(carry, x)
            return carry, out

        _, (prefr, prefi, prefsig) = jax.lax.scan(
            pref_step, (er, ei, esig), (allr, alli, allsig))
        entry_r = prefr[idx]
        entry_i = prefi[idx]
        entry_sig = prefsig[idx]

        # global prefix for every local step: entry @ local_prefix
        gr_t = _mm(entry_r[None], qr) - _mm(entry_i[None], qi)
        gi_t = _mm(entry_r[None], qi) + _mm(entry_i[None], qr)
        sig_t = entry_sig[None] + sig                      # [Tc, B]

        em = partial(jnp.einsum, precision="highest")
        str_ = em('brd,tbde->tbre', g0r, gr_t) - em('brd,tbde->tbre', g0i, gi_t)
        sti = em('brd,tbde->tbre', g0r, gi_t) + em('brd,tbde->tbre', g0i, gr_t)

        gxr = _mm(str_, xpr) - _mm(sti, xpi)
        gxi = _mm(str_, xpi) + _mm(sti, xpr)
        ehat = jnp.sum(str_ * gxr + sti * gxi, axis=(-2, -1))   # [Tc, B]
        trhat = jnp.sum(str_ * str_ + sti * sti, axis=(-2, -1))

        # previous-step trace: shift within the chunk; the first step's
        # predecessor is the entry state G_0 @ entry (trace + its logscale)
        entry_gr = em('brd,bde->bre', g0r, entry_r) \
            - em('brd,bde->bre', g0i, entry_i)
        entry_gi = em('brd,bde->bre', g0r, entry_i) \
            + em('brd,bde->bre', g0i, entry_r)
        tr_entry = jnp.sum(entry_gr ** 2 + entry_gi ** 2, axis=(-2, -1))
        trhat_prev = jnp.concatenate([tr_entry[None], trhat[:-1]], axis=0)
        sig_prev = jnp.concatenate([entry_sig[None], sig_t[:-1]], axis=0)

        e = (ehat / jnp.maximum(trhat_prev, cfg.norm_eps)
             * jnp.exp(2.0 * (sig_t - sig_prev)))
        arg = 1.0 + e * s_chunk
        if cfg.log_eps > 0:
            arg = jnp.maximum(arg, cfg.log_eps)
        local_loss = jnp.sum(-jnp.log(arg), axis=0)        # [B]
        return jax.lax.psum(local_loss, axis)[None]

    sharded = shard_map(local, mesh=mesh, in_specs=(P(axis, None),),
                        out_specs=P(axis, None), check_rep=False)
    losses = sharded(incs)                                 # [S, B] (equal rows)
    return jnp.mean(losses[0])


def psi_nll_time_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = TIME_AXIS):
    """Time-sharded NLL for the pure-state model (rank-1 factor; see
    core._factor_g0)."""
    return rho_nll_time_sharded(params, cfg, signals, mesh, axis=axis)
