"""A/B psi bond_dim=128 across batch sizes on the real TPU.

The r3/r4 bench characterized psi D=128 at B=64 (~42% MFU both
precisions) and attributed the gap to "pass latency on the [256,256]
block operands". But the kernels put EXAMPLES ON LANES: every dot is
[2D,2D] @ [2D,B], so B=64 leaves half of the MXU's 128 lanes empty on
every pass — a 2x occupancy artifact that has nothing to do with pass
latency. This tool measures the full donated train step (Adam update
included, same path as bench.py) at B in {64, 128, 256} x precision in
{highest, high} with the corrected iters=10 harness, reporting ms/step,
frames/s and hw-MFU under the same accounting as bench.py.

Timing discipline (CLAUDE.md): donated jit, fresh real copies per case,
first post-barrier dispatch amortized over a long loop, host readback
barrier at the end.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.ops.pallas_block import auto_stream
from audio_mps_tpu.training import init_params_for, make_train_step


def time_case(D, B, T, precision, iters, stream=None, family="psi_mps",
              rank=None, pad=None):
    kw = {}
    if stream is not None:
        kw["kernel_stream"] = stream
    if rank is not None:
        kw["initial_rank"] = rank
    if pad is not None:
        kw["kernel_pad_lanes"] = pad
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B,
                     kernel_precision=precision, **kw)
    params = init_params_for(family, jax.random.PRNGKey(0), cfg)
    opt, step = make_train_step(family, cfg)
    st = opt.init(params)
    sig = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)
    params, st, m = step(params, st, sig)
    print(f"  warm loss={float(m['model_loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, st, m = step(params, st, sig)
    lf = float(m["model_loss"])            # host readback barrier
    dt = (time.perf_counter() - t0) / iters
    lanes = 1 if family == "psi_mps" else (rank if rank is not None else D)
    streamed = auto_stream(cfg, B * lanes, T - 1, cfg.defer_norm, False)
    return dt, lf, streamed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--T", type=int, default=16385)
    ap.add_argument("--D", type=int, default=128)
    ap.add_argument("--batches", type=str, default="64,128,256")
    ap.add_argument("--precisions", type=str, default="highest,high")
    ap.add_argument("--stream", type=str, default=None,
                    help="override kernel_stream (auto/on/off)")
    ap.add_argument("--family", type=str, default="psi_mps")
    ap.add_argument("--rank", type=int, default=None,
                    help="initial_rank for rho_mps")
    ap.add_argument("--pad", type=str, default=None,
                    help="override kernel_pad_lanes (auto/on/off)")
    args = ap.parse_args()

    PASS_FACTOR = {"highest": 6.0, "high": 3.0, "default": 1.0}
    PEAK = 197.0
    out = {"D": args.D, "T": args.T, "iters": args.iters}
    for B in [int(b) for b in args.batches.split(",")]:
        for prec in args.precisions.split(","):
            key = f"B{B}_{prec}"
            print(f"case {key}", flush=True)
            dt, lf, streamed = time_case(args.D, B, args.T, prec,
                                         args.iters, args.stream,
                                         args.family, args.rank, args.pad)
            steps = args.T - 1
            lanes_per_ex = 1 if args.family == "psi_mps" else (
                args.rank if args.rank is not None else args.D)
            flops = ((80.0 if streamed else 96.0)
                     * args.D * args.D * B * lanes_per_ex * steps)
            mfu = 100.0 * flops / dt / 1e12 * PASS_FACTOR[prec] / PEAK
            out[key] = {"ms": round(dt * 1e3, 2),
                        "frames_per_s_M": round(B * steps / dt / 1e6, 2),
                        "mfu_pct": round(mfu, 1),
                        "stream": streamed, "loss": round(lf, 4)}
            print(f"  -> {out[key]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
