"""A/B the streamed-states rank-partials kernels on the real TPU.

Measures the fused rank-partials train-relevant path (value+grad of the
chunked NLL through combine_rank_partials) stream OFF vs ON, at the
RANKBENCH_r04 shapes: D=64 full-rank single-chunk (the fused rank-TP
shard shape, ~4.3 GB stream — inside the HBM budget unsegmented) and
D=256 full-rank chunked (beyond the single-kernel VMEM ceiling; an
unsegmented stream would be ~17 GB/chunk, so the streamed variant rides
time_segment — jax.checkpoint keeps only one segment's stream alive
during the backward). Writes one JSON to stdout; timing follows the
axon discipline (donated jit, long loop, host readback barrier).
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
from audio_mps_tpu.models.params import init_rho
from audio_mps_tpu.ops.pallas_rank import rho_nll_rank_chunked


def time_case(cfg, params, sig, *, rank_chunk, precision, stream, seg,
              iters, xla=False):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(p, s):
        if xla:
            # the auto-gate's fallback path (training.nll_fn_for):
            # chunked-remat XLA scan over the purification factor
            from audio_mps_tpu.models.core import rho_nll_factor
            loss = lambda q: rho_nll_factor(q, cfg, s)
        else:
            def loss(q):
                return rho_nll_rank_chunked(q, cfg, s,
                                            rank_chunk=rank_chunk,
                                            precision=precision,
                                            stream=stream,
                                            time_segment=seg)
        l, g = jax.value_and_grad(loss)(p)
        # fold the grad back so donation keeps buffers warm
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, g), l

    # a REAL copy: jnp.asarray would alias the shared params and the
    # donated jit would delete them for every later (precision, stream)
    # variant of the same case
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--T", type=int, default=16385)
    ap.add_argument("--skip_d256", action="store_true")
    # serialize big cases into fresh processes: a process that already ran
    # a multi-GB-stream kernel can leave HBM pressure that makes a later
    # large jit page catastrophically (CLAUDE.md r4 stream-scaling caveat)
    ap.add_argument("--only", choices=["d64", "d256", "d256_shard64"],
                    default=None)
    args = ap.parse_args()

    out = {"T": args.T}
    # (case, cfg, B, rank_chunk, [(precision, stream, time_segment,
    #  variant-suffix)])
    if args.skip_d256 and args.only in ("d256", "d256_shard64"):
        ap.error(f"--skip_d256 conflicts with --only {args.only}")
    cases = [("d64_full", CMPSConfig(bond_dim=64, minibatch_size=8), 8, 64,
              [("highest", False, None, "base"),
               ("highest", True, None, "stream"),
               ("high", False, None, "base"),
               ("high", True, None, "stream"),
               ("highest", False, None, "xla")])]
    if not args.skip_d256:
        cases.append(
            ("d256_full", CMPSConfig(bond_dim=256, minibatch_size=8), 8, 64,
             [("high", False, None, "base"),
              ("high", True, 2048, "streamseg"),
              ("high", False, 2048, "baseseg"),
              # does streaming flip the fp32 "highest" auto decision?
              # (RANKBENCH_r04: non-streamed chunked fp32 was 0.93x the
              # XLA scan, so auto stays on XLA at "highest" — a >=1.2x
              # stream win would put the fused path ahead)
              ("highest", False, None, "base"),
              ("highest", True, 2048, "streamseg"),
              # the auto-gate's comparison point at the SAME (T, B,
              # value+grad) semantics
              ("highest", False, None, "xla")]))
        # the fused rank-TP per-chip shard shape: D=256 with a rank-64
        # local factor (what each of 4 chips owns under --mesh=rank:4)
        cases.append(
            ("d256_shard64",
             CMPSConfig(bond_dim=256, minibatch_size=8, initial_rank=64),
             8, 64,
             [("highest", False, None, "base"),
              ("highest", None, None, "auto"),
              ("high", False, None, "base"),
              ("high", None, None, "auto"),
              ("highest", False, None, "xla")]))
    if args.only == "d64":
        cases = [c for c in cases if c[0] == "d64_full"]
    elif args.only == "d256":
        cases = [c for c in cases if c[0] == "d256_full"]
    elif args.only == "d256_shard64":
        cases = [c for c in cases if c[0] == "d256_shard64"]
    for name, cfg, B, rank_chunk, variants in cases:
        params = init_rho(jax.random.PRNGKey(0), cfg)
        sig = damped_sine_batch(jax.random.PRNGKey(1), B, args.T,
                                cfg.delta_t)
        for prec, stream, seg, suffix in variants:
            key = f"{name}_{prec}_{suffix}"
            print(f"case {key}", flush=True)
            try:
                ms, loss = time_case(cfg, params, sig,
                                     rank_chunk=rank_chunk,
                                     precision=prec, stream=stream,
                                     seg=seg, iters=args.iters,
                                     xla=(suffix == "xla"))
                out[key + "_ms"] = round(ms, 2)
                out[key + "_loss"] = round(loss, 5)
                print(f"  {ms:.2f} ms/step", flush=True)
            except Exception as e:  # noqa: BLE001 — record and move on
                out[key + "_error"] = repr(e)[:200]
                print(f"  ERROR {e!r}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
