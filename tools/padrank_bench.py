"""A/B the rank-partials lane padding on the real TPU.

Measures value+grad of the fused rank-partials path (rho_nll_rank_chunked
through combine_rank_partials) with kernel_pad_lanes OFF vs AUTO at
misaligned shapes where auto_pad_rank_partials engages:

- shard8: D=64 B=8 r_loc=8 — the PER-CHIP shape of full-rank D=64
  rank-TP over 8 chips (BR=64 misaligned; pads to r=16 -> BR=128,
  unlocking the streamed backward);
- rank40: D=64 B=8 rank=40 — a rank with NO lane-aligned divisor
  (chunks 40/20/10/8/... all misaligned), so unpadded can never stream;
  auto pads the single 40-row chunk to 48 (BR=384).
- overshoot: D=64 B=12 rank=8 — non-power-of-2 B where the uniform
  per-example pad OVERSHOOTS the tile ceiling (96 -> 384 lanes = 1 -> 3
  MXU tiles, real extra passes); measured with pad FORCED ("on") vs off
  to justify the auto-decline guard (auto leaves this shape unpadded).

Timing follows the axon discipline (donated jit, host readback barrier,
back-to-back loop). Like bench.py, the ~19 ms first-dispatch-after-
readback tunnel penalty sits inside the window and is amortized by
iters (default 20 here: <=5% on the fastest ~20 ms row; the committed
PADRANK_r04.json rows were captured at the recorded iters). One JSON
line to stdout. Losses: identical at fp32; bf16x3 differs <= ~1e-5
where padding changes the auto unroll (reduction association).
"""
import argparse
import dataclasses
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
from audio_mps_tpu.models.params import init_rho
from audio_mps_tpu.ops.pallas_rank import (auto_pad_rank_partials,
                                           rank_chunk_for,
                                           rho_nll_rank_chunked)


def time_case(cfg, params, sig, *, rank_chunk, precision, iters,
              kernel="partials"):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(p, s):
        def loss(q):
            if kernel == "mono":
                from audio_mps_tpu.ops.pallas_block import \
                    rho_nll_block_trainable
                return rho_nll_block_trainable(q, cfg, s,
                                               precision=precision,
                                               defer_norm=True)
            return rho_nll_rank_chunked(q, cfg, s, rank_chunk=rank_chunk,
                                        precision=precision)
        l, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, g), l

    p = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    p, l = step(p, sig)
    print(f"  warm loss={float(l):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, l = step(p, sig)
    lf = float(l)                     # host readback barrier
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, lf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--T", type=int, default=16385)
    args = ap.parse_args()

    out = {"T": args.T, "iters": args.iters}
    # (name, D, rank, B, pad mode measured against "off", kernel):
    # "overshoot" rows force the pad ("on") that auto declines, for BOTH
    # the rank-partials and the monolithic block kernel (the same guard
    # lives in auto_pad_rank_partials and pallas_block.auto_pad_rank)
    cases = [("shard8", 64, 8, 8, "auto", "partials"),
             ("rank40", 64, 40, 8, "auto", "partials"),
             ("overshoot", 64, 8, 12, "on", "partials"),
             ("mono_overshoot", 64, 8, 12, "on", "mono")]
    for name, D, rank, B, pad_mode, kernel in cases:
        base = CMPSConfig(bond_dim=D, minibatch_size=B, initial_rank=rank)
        params = init_rho(jax.random.PRNGKey(0), base)
        sig = damped_sine_batch(jax.random.PRNGKey(1), B, args.T,
                                base.delta_t)
        for precision in ("highest", "high"):
            for mode in ("off", pad_mode):
                cfg = dataclasses.replace(base, kernel_pad_lanes=mode,
                                          kernel_precision=precision)
                chunk = rank_chunk_for(cfg, B, rank)
                r_eff = auto_pad_rank_partials(cfg, B, chunk, False)
                tag = f"{name}_{precision}_{mode}"
                print(f"{tag}: chunk={chunk} r_eff={r_eff}", flush=True)
                dt, lf = time_case(cfg, params, sig, rank_chunk=chunk,
                                   precision=precision, iters=args.iters,
                                   kernel=kernel)
                print(f"  {dt:.2f} ms/step loss={lf:.4f}", flush=True)
                out[f"ms_{tag}"] = round(dt, 2)
                out[f"loss_{tag}"] = lf
        for precision in ("highest", "high"):
            a = out[f"ms_{name}_{precision}_off"]
            b = out[f"ms_{name}_{precision}_{pad_mode}"]
            out[f"speedup_{name}_{precision}"] = round(a / b, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
