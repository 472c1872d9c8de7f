"""Purification-rank sharding — the rho family's tensor-parallel strategy.

SURVEY.md §2.4 leaves TP as "not needed at D<=128"; this closes the row
with the TPU-idiomatic decomposition for when D (and with it the default
purification rank) outgrows one chip's VMEM (the measured fused-kernel
ceiling: ops/pallas_grad.fused_supported — full-rank rho at B=8 stops
between D=192 and D=256 on v5e).

The key observation: the factor update ``G <- G U^dag`` (rho = G^dag G,
G of shape [B, rank, D]) is ROW-INDEPENDENT in the rank dimension — each
rank row evolves by the same right-multiplication. Sharding the rank rows
over a ``model`` mesh axis therefore needs NO per-step communication for
the state; only the two per-step scalars — the expectation
``e = sum Re(G . conj(G X))`` and the trace ``tr = ||G||_F^2`` — are sums
over rank rows, reduced with ONE fused `psum` of a [2, B] stack per step
(riding ICI). Compare classic megatron-style TP, which this mirrors: the
weight rows are sharded, activations stay local, and only the reduction
crosses chips.

The strategy composes with data parallelism on a 2D (data, model) mesh
the same way parallel/combined.py composes DP x time.

Exactness is pinned by tests/test_parallel.py (values AND gradients equal
the single-device factor scan; the W-shard cotangents gather back through
shard_map). This path runs the XLA chunked-remat scan inside each shard —
the fused Pallas kernels require the full rank-group sums in-kernel, so
rank sharding is the scale-out story BEYOND their single-chip ceiling.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .compat import shard_map

from ..config import CMPSConfig
from ..models import core
from ..models.cell import make_constants, nll_increment

MODEL_AXIS = "model"


def make_model_mesh(n_devices: int = None, axis: str = MODEL_AXIS) -> Mesh:
    """1D mesh over the rank-sharding axis."""
    import numpy as np
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def _param_specs(params, axis: str):
    """PartitionSpec tree for the params pytree: W rows sharded over
    `axis`, everything else replicated."""
    def spec(path, leaf):
        name = getattr(path[-1], "name", str(path[-1]))
        return P(axis, None) if name in ("Wx", "Wy") else P()
    return jax.tree_util.tree_map_with_path(spec, params)


def rho_nll_rank_sharded(params, cfg: CMPSConfig, signals, mesh: Mesh,
                         axis: str = MODEL_AXIS):
    """Mean NLL of waveforms [B, T] with the purification rank sharded
    over `axis` (semantics of core.rho_nll_factor; reference hot loop:
    model.py:132-142). Differentiable — W-shard cotangents gather back to
    the full [rank, D] parameters."""
    rank = params.Wx.shape[0]
    n = mesh.shape[axis]
    if rank % n:
        raise ValueError(f"purification rank {rank} must divide the "
                         f"{axis!r} axis size {n}")

    def local(p, sig):
        # p.Wx/p.Wy are the LOCAL rank rows; all other params replicated
        cc = make_constants(p, cfg)
        incs = (sig[:, 1:] - sig[:, :-1]).T            # [T-1, B]
        B = sig.shape[0]
        # global Frobenius normalization of the initial factor
        tr0 = jax.lax.psum(jnp.sum(p.Wx * p.Wx + p.Wy * p.Wy), axis)
        inv0 = jax.lax.rsqrt(jnp.maximum(tr0, cfg.norm_eps))
        gr = jnp.broadcast_to((p.Wx * inv0)[None], (B,) + p.Wx.shape)
        gi = jnp.broadcast_to((p.Wy * inv0)[None], (B,) + p.Wy.shape)
        mm = partial(jnp.matmul, precision="highest")
        cdr, cdi = cc.Cr.T, -cc.Ci.T
        rdr, rdi = cc.Rr.T, -cc.Ri.T

        def step(carry, inc):
            gr, gi, loss = carry
            s = (inc / cc.A)[:, None, None]
            a1r = mm(gr, cdr) - mm(gi, cdi)
            a1i = mm(gr, cdi) + mm(gi, cdr)
            a2r = mm(gr, rdr) - mm(gi, rdi)
            a2i = mm(gr, rdi) + mm(gi, rdr)
            yr = a1r + s * a2r
            yi = a1i + s * a2i
            gxr = mm(yr, cc.Xr) - mm(yi, cc.Xi)
            gxi = mm(yr, cc.Xi) + mm(yi, cc.Xr)
            # the ONLY cross-shard traffic: one [2, B] psum per step
            part = jnp.stack([
                jnp.sum(yr * gxr + yi * gxi, axis=(1, 2)),
                jnp.sum(yr * yr + yi * yi, axis=(1, 2))])
            tot = jax.lax.psum(part, axis)
            e, tr = tot[0], tot[1]
            loss = loss + nll_increment(e, s[:, 0, 0], cfg.log_eps)
            inv = jax.lax.rsqrt(jnp.maximum(tr, cfg.norm_eps))[:, None,
                                                               None]
            yr = yr * inv
            yi = yi * inv
            nr = yr * cc.p_c - yi * cc.p_s
            ni = yr * cc.p_s + yi * cc.p_c
            return (nr, ni, loss)

        carry = (gr, gi, jnp.zeros((B,), sig.dtype))
        _, _, loss = core.chunked_scan(step, carry, incs, cfg.scan_chunk)
        return jnp.mean(loss)

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(_param_specs(params, axis), P()),
                        out_specs=P(), check=False)
    return sharded(params, signals)
