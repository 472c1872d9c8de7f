"""Cross-chip time-sharded NLL — blockwise sequence parallelism.

The strongest form of SURVEY.md §2.4's time-sharding plan: each of S chips
owns a contiguous chunk of the waveform; all chips work FULLY in parallel
(no pipeline bubbles) because the cMPS evolution in purification-factor
form is a product of per-step D x D transfer matrices:

  1. each chip composes its chunk's transfer operators in bounded-memory
     sub-chunks (`time_chunk` steps per `associative_scan`, rescaled as
     core.pscan_combine) and saves the per-sub-chunk products;
  2. ONE `all_gather` of the S chunk-products (tiny: S x [B, D, D]) rides
     ICI; every chip forms its entry operator as the exclusive prefix of
     its predecessors' chunk products;
  3. each chip walks its sub-chunks sequentially (memory stays bounded),
     computing per-step prefixes locally and evaluating its slice of the
     loss (the log-scale differences make the per-step normalization
     ratios exact across every boundary); partial losses are `psum`'d.

Semantics are identical to core.rho_nll_factor (pinned by tests on the
virtual CPU mesh), and PsiParams work too (rank-1 factor, core.factor_g0).
Contrast with parallel/time_pipeline.py: the pipeline streams the exact
sequential recursion (arbitrary step nonlinearity, M/(M+S-1) efficiency);
this module exploits the linear-transfer structure for 100% parallel
efficiency at the cost of one all-gather and rescaled arithmetic.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from .compat import shard_map

from ..config import CMPSConfig
from ..models.cell import make_constants
from ..models.core import factor_g0, pscan_combine, pscan_operators
from .time_pipeline import TIME_AXIS, make_time_mesh  # noqa: F401

_mm = partial(jnp.matmul, precision="highest")
_em = partial(jnp.einsum, precision="highest")


def rho_nll_time_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = TIME_AXIS, time_chunk: int = 1024,
                         batch_axis: Optional[str] = None):
    """Mean NLL of waveforms [B, T] with the time axis sharded over `mesh`
    (semantics of core.rho_nll_factor / reference model.py:132-142). Also
    accepts PsiParams (rank-1 factor). `time_chunk` bounds per-chip memory
    (at most that many [B, D, D] operators live in one associative scan).

    `batch_axis`: optional SECOND mesh axis to shard the batch over — the
    2D data x sequence parallel strategy (parallel/combined.py): each
    device owns a [B/dp, (T-1)/S] tile; the all_gather/psum collectives
    ride the time axis only, so the two parallelism forms compose without
    extra communication."""
    B, T = signals.shape
    S = mesh.shape[axis]
    Bl = B // mesh.shape[batch_axis] if batch_axis is not None else B
    if batch_axis is not None and B % mesh.shape[batch_axis]:
        raise ValueError(f"B={B} not divisible by mesh axis "
                         f"{batch_axis}={mesh.shape[batch_axis]}")
    n_steps = T - 1
    if n_steps % S:
        raise ValueError(f"T-1={n_steps} steps not divisible by {S} chips")
    Tc = n_steps // S
    sub = min(time_chunk, Tc)
    if Tc % sub:
        raise ValueError(f"per-chip steps {Tc} not divisible by "
                         f"time_chunk {sub}")
    n_sub = Tc // sub

    cc = make_constants(params, cfg)
    g0r, g0i = factor_g0(params, cfg, Bl)   # rows identical per example
    cdr, cdi, rdr, rdi, xpr, xpi = pscan_operators(cc)
    incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A    # [T-1, B]

    d = cdr.shape[-1]
    # params-derived constants enter as shard_map OPERANDS (replicated
    # specs), not closure captures: captured arrays keep their outer
    # Auto-mesh avals inside the Manual context, and the scan transpose
    # then builds cotangent zeros with the wrong mesh kind (surfaced by
    # multi-step training, where donated step outputs carry the 2D-mesh
    # NamedSharding)
    consts = (g0r, g0i, cdr, cdi, rdr, rdi, xpr, xpi)

    def local(consts, s_chunk):                            # [Tc, Bl]
        g0r, g0i, cdr, cdi, rdr, rdi, xpr, xpi = consts

        def _apply_g0(er, ei):
            """G_0 @ E for a [B, D, D] operator (factor [B, r, D])."""
            gr = _em('brd,bde->bre', g0r, er) - _em('brd,bde->bre', g0i, ei)
            gi = _em('brd,bde->bre', g0r, ei) + _em('brd,bde->bre', g0i, er)
            return gr, gi

        def _sub_ops(s_sub):
            """Per-step transfer operators of one sub-chunk
            [sub, B, D, D]."""
            sb = s_sub[:, :, None, None]
            return (cdr[None, None] + sb * rdr[None, None],
                    cdi[None, None] + sb * rdi[None, None])

        idx = jax.lax.axis_index(axis)
        subs = s_chunk.reshape(n_sub, sub, Bl)

        ident = (jnp.broadcast_to(jnp.eye(d), (Bl, d, d)),
                 jnp.zeros((Bl, d, d)), jnp.zeros((Bl,)))

        # pass A: per-sub-chunk products (bounded memory)
        def prod_step(carry, s_sub):
            mr, mi = _sub_ops(s_sub)
            qr, qi, sig = jax.lax.associative_scan(
                pscan_combine, (mr, mi, jnp.zeros(s_sub.shape)))
            piece = (qr[-1], qi[-1], sig[-1])
            return pscan_combine(carry, piece), piece

        (totr, toti, totsig), pieces = jax.lax.scan(prod_step, ident, subs)

        # one collective: chunk products to every chip
        allr = jax.lax.all_gather(totr, axis)              # [S, B, D, D]
        alli = jax.lax.all_gather(toti, axis)
        allsig = jax.lax.all_gather(totsig, axis)

        def pref_step(carry, x):
            out = carry
            return pscan_combine(carry, x), out

        _, (prefr, prefi, prefsig) = jax.lax.scan(
            pref_step, ident, (allr, alli, allsig))
        entry = (prefr[idx], prefi[idx], prefsig[idx])

        # pass B: walk sub-chunks with the running entry operator
        def loss_step(carry, xs):
            (er, ei, esig), loss = carry
            s_sub, piece = xs
            mr, mi = _sub_ops(s_sub)
            qr, qi, sig = jax.lax.associative_scan(
                pscan_combine, (mr, mi, jnp.zeros(s_sub.shape)))
            # global prefix for each step: entry @ local_prefix
            gr_t = _mm(er[None], qr) - _mm(ei[None], qi)
            gi_t = _mm(er[None], qi) + _mm(ei[None], qr)
            sig_t = esig[None] + sig                       # [sub, B]
            str_ = _em('brd,tbde->tbre', g0r, gr_t) \
                - _em('brd,tbde->tbre', g0i, gi_t)
            sti = _em('brd,tbde->tbre', g0r, gi_t) \
                + _em('brd,tbde->tbre', g0i, gr_t)
            gxr = _mm(str_, xpr) - _mm(sti, xpi)
            gxi = _mm(str_, xpi) + _mm(sti, xpr)
            ehat = jnp.sum(str_ * gxr + sti * gxi, axis=(-2, -1))
            trhat = jnp.sum(str_ * str_ + sti * sti, axis=(-2, -1))
            # previous-step trace: shift; the first step's predecessor is
            # the sub-chunk entry state
            egr, egi = _apply_g0(er, ei)
            tr_entry = jnp.sum(egr ** 2 + egi ** 2, axis=(-2, -1))
            trhat_prev = jnp.concatenate([tr_entry[None], trhat[:-1]], 0)
            sig_prev = jnp.concatenate([esig[None], sig_t[:-1]], 0)
            e = (ehat / jnp.maximum(trhat_prev, cfg.norm_eps)
                 * jnp.exp(2.0 * (sig_t - sig_prev)))
            arg = 1.0 + e * s_sub
            if cfg.log_eps > 0:
                arg = jnp.maximum(arg, cfg.log_eps)
            loss = loss + jnp.sum(-jnp.log(arg), axis=0)
            entry_next = pscan_combine((er, ei, esig), piece)
            return (entry_next, loss), None

        (_, local_loss), _ = jax.lax.scan(
            loss_step, (entry, jnp.zeros((Bl,))), (subs, pieces))
        return jax.lax.psum(local_loss, axis)[None]

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(axis, batch_axis)),
                        out_specs=P(axis, batch_axis), check=False)
    losses = sharded(consts, incs)                         # [S, B] (equal rows)
    return jnp.mean(losses[0])


def psi_nll_time_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = TIME_AXIS, time_chunk: int = 1024,
                         batch_axis: Optional[str] = None):
    """Time-sharded NLL for the pure-state model (rank-1 factor; see
    core.factor_g0)."""
    return rho_nll_time_sharded(params, cfg, signals, mesh, axis=axis,
                                time_chunk=time_chunk,
                                batch_axis=batch_axis)
