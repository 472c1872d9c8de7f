"""Per-tick economics of the FUSED temporal pipeline on the real TPU.

One chip cannot host a multi-stage time mesh, but it CAN measure the
pipeline's cost model exactly: on a real S-stage mesh every tick runs the
same carried-state chunk kernel shape on every stage, so wall-clock =
(M+S-1) ticks x the per-tick chunk cost measured here (+ ~us ppermutes).
Cases (T=16385 = the RANKBENCH step count; value+grad, donated jit,
readback barrier, iters>=10 per the r4 timing-harness finding):

- rho D=64 B=8 full-rank: `rho_nll_pipelined_fused` on a 1-stage mesh
  with M=1 (one tick over the whole T — pins the pipeline scaffolding
  cost against the monolithic partials path `rho_nll_rank_chunked`) and
  M=8 (per-example microbatches: 8 ticks of b=1 — the handoff-ready
  shape; lanes pad 64->128), vs the XLA chunked-remat factor scan (the
  ~900 ms cliff the fused strategies exist to avoid).
- psi D=64 B=128 (the headline shape): the fused pipeline's rank-1
  embedding with M=1 and M=4, vs the shipping psi block kernel
  (`psi_nll_block_trainable`) and the XLA scan.

Writes PIPEBENCH JSON to stdout.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models.params import init_psi, init_rho


def time_loss(loss, params, iters, mesh=None):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(p):
        l, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, g), l

    p = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    if mesh is not None:
        # COMMIT the donated params to the mesh before the loop: an
        # uncommitted input makes EVERY donated shard_map call re-place
        # its operands on this backend (measured 51.3 -> 5.9 ms on a
        # minimal matmul probe; the device trace shows pipeline device
        # time == monolithic, the rest was this host-side re-placement).
        from jax.sharding import NamedSharding, PartitionSpec as P
        p = jax.device_put(p, NamedSharding(mesh, P()))
    p, l = step(p)
    print(f"  warm loss={float(l):.4f}", flush=True)
    if mesh is not None:
        # discard >=8 calls + a readback: a SMALL shard_map step's first
        # async loop after compile runs ~300 ms/call on this backend
        # (D=16 probe; the D=64 T=16385 rows here measured loop0==loop2
        # — no transient — so existing PIPEBENCH numbers stand).
        for _ in range(max(8, iters)):
            p, l = step(p)
        float(l)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, l = step(p)
    lf = float(l)                     # host readback barrier
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, lf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--T", type=int, default=16385)
    ap.add_argument("--precision", default=None,
                    help="kernel precision for the fused rows "
                         "(default: both highest and high)")
    args = ap.parse_args()
    precisions = ([args.precision] if args.precision
                  else ["highest", "high"])

    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, psi_nll_pipelined_fused, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.core import psi_nll, rho_nll_factor
    from audio_mps_tpu.ops.pallas_block import psi_nll_block_trainable
    from audio_mps_tpu.ops.pallas_rank import rho_nll_rank_chunked

    mesh = make_time_mesh(1)
    out = {"T": args.T, "iters": args.iters}

    # --- rho D=64 B=8 full-rank
    cfg = CMPSConfig(bond_dim=64, minibatch_size=8, scan_chunk=2048)
    pr = init_rho(jax.random.PRNGKey(0), cfg)
    sig = damped_sine_batch(jax.random.PRNGKey(1), 8, args.T, cfg.delta_t)
    for prec in precisions:
        # M=4 pins the cost model's interior point: tick ~ a + c*tiles
        # with a ~= c predicts m4 = 8 units vs m1 = 5 and m8 = 16
        for m in (1, 4, 8):
            key = f"rho_d64_pipe_fused_m{m}_{prec}"
            print(f"case {key}", flush=True)
            ms, loss = time_loss(
                lambda p: rho_nll_pipelined_fused(
                    p, cfg, sig, mesh, num_microbatches=m, precision=prec),
                pr, args.iters, mesh=mesh)
            out[key] = round(ms, 2)
            out[key + "_loss"] = round(loss, 6)
            print(f"  {ms:.2f} ms", flush=True)
        key = f"rho_d64_mono_{prec}"
        print(f"case {key}", flush=True)
        ms, loss = time_loss(
            lambda p: rho_nll_rank_chunked(p, cfg, sig, rank_chunk=64,
                                           precision=prec), pr, args.iters)
        out[key] = round(ms, 2)
        out[key + "_loss"] = round(loss, 6)
        print(f"  {ms:.2f} ms", flush=True)
    print("case rho_d64_xla", flush=True)
    ms, loss = time_loss(lambda p: rho_nll_factor(p, cfg, sig), pr, 3)
    out["rho_d64_xla"] = round(ms, 2)
    out["rho_d64_xla_loss"] = round(loss, 6)
    print(f"  {ms:.2f} ms", flush=True)

    # --- psi D=64 B=128 (headline shape)
    cfg_p = CMPSConfig(bond_dim=64, minibatch_size=128, scan_chunk=2048)
    pp = init_psi(jax.random.PRNGKey(0), cfg_p)
    sig_p = damped_sine_batch(jax.random.PRNGKey(1), 128, args.T,
                              cfg_p.delta_t)
    for prec in precisions:
        for m in (1, 4):
            key = f"psi_d64_pipe_fused_m{m}_{prec}"
            print(f"case {key}", flush=True)
            ms, loss = time_loss(
                lambda p: psi_nll_pipelined_fused(
                    p, cfg_p, sig_p, mesh, num_microbatches=m,
                    precision=prec), pp, args.iters, mesh=mesh)
            out[key] = round(ms, 2)
            out[key + "_loss"] = round(loss, 6)
            print(f"  {ms:.2f} ms", flush=True)
        key = f"psi_d64_block_{prec}"
        print(f"case {key}", flush=True)
        ms, loss = time_loss(
            lambda p: psi_nll_block_trainable(p, cfg_p, sig_p,
                                              precision=prec,
                                              defer_norm=True),
            pp, args.iters)
        out[key] = round(ms, 2)
        out[key + "_loss"] = round(loss, 6)
        print(f"  {ms:.2f} ms", flush=True)
    print("case psi_d64_xla", flush=True)
    ms, loss = time_loss(lambda p: psi_nll(p, cfg_p, sig_p), pp, 3)
    out["psi_d64_xla"] = round(ms, 2)
    out["psi_d64_xla_loss"] = round(loss, 6)
    print(f"  {ms:.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
