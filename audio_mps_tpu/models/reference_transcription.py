"""Faithful transcription of the reference evolution semantics.

A direct, unoptimized rendering of the reference hot loop — lab-frame
per-step phase recomputation (reference: model.py:172-196) over the
density matrix, with the chunked-remat scan for feasible BPTT. This is the
ANCHOR implementation: the rotating-frame/purification-factor/Pallas fast
paths are pinned against it by tests, and bench.py reports speedups
relative to it (the reference publishes no numbers of its own —
BASELINE.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CMPSConfig
from . import cell, core


def rho_nll_lab_frame(params, cfg: CMPSConfig, signals):
    """Mean NLL, reference-shaped: carry (rho, loss, t), phases at t
    recomputed inside every step (reference: model.py:132-158)."""
    incs = (signals[:, 1:] - signals[:, :-1]).T
    B = signals.shape[0]
    rr, ri = core.rho0(params, cfg)
    rr = jnp.broadcast_to(rr, (B,) + rr.shape)
    ri = jnp.broadcast_to(ri, (B,) + ri.shape)

    def step(carry, inc):
        rr, ri, loss, t = carry
        rr2, ri2 = cell.lab_update_ancilla_rho(params, cfg, rr, ri, inc, t)
        e = cell.lab_expectation_rho(params, rr2, ri2, t)
        loss = loss + cell.nll_increment(e, inc / params.A, cfg.log_eps)
        rr2, ri2 = cell.normalize_rho(rr2, ri2, cfg.norm_eps)
        return (rr2, ri2, loss, t + cfg.delta_t), None

    def plain(c, xs):
        return jax.lax.scan(step, c, xs)[0]

    carry = (rr, ri, jnp.zeros((B,)), jnp.float32(0.0))
    T = incs.shape[0]
    chunk = cfg.scan_chunk
    if chunk and chunk > 1 and T > chunk:
        n_full = T // chunk
        inner = jax.checkpoint(plain)
        main = incs[: n_full * chunk].reshape((n_full, chunk, B))
        carry = jax.lax.scan(lambda c, xc: (inner(c, xc), None), carry,
                             main)[0]
        if T % chunk:
            carry = plain(carry, incs[n_full * chunk:])
    else:
        carry = plain(carry, incs)
    return jnp.mean(carry[2])


def psi_nll_lab_frame(params, cfg: CMPSConfig, signals):
    """Mean NLL, reference-shaped pure-state variant
    (reference: model.py:257-298)."""
    incs = (signals[:, 1:] - signals[:, :-1]).T
    B = signals.shape[0]
    pr, pi = core.psi0(params, cfg)
    pr = jnp.broadcast_to(pr, (B,) + pr.shape)
    pi = jnp.broadcast_to(pi, (B,) + pi.shape)

    def step(carry, inc):
        pr, pi, loss, t = carry
        pr2, pi2 = cell.lab_update_ancilla_psi(params, cfg, pr, pi, inc, t)
        e = cell.lab_expectation_psi(params, pr2, pi2, t)
        loss = loss + cell.nll_increment(e, inc / params.A, cfg.log_eps)
        pr2, pi2 = cell.normalize_psi(pr2, pi2, cfg.norm_eps)
        return (pr2, pi2, loss, t + cfg.delta_t), None

    carry = (pr, pi, jnp.zeros((B,)), jnp.float32(0.0))
    carry = jax.lax.scan(step, carry, incs)[0]
    return jnp.mean(carry[2])
