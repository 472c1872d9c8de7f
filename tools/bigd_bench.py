"""Large-D frontier: measure where the fused rank-chunked path ends and
what users get past it (VERDICT r4 item 3: "extend the large-D story to
D=512 — measure it, or record the precise boundary with a guard + test").

Structural fact (ops/pallas_rank.py): rank chunking shrinks the LANE
dimension (B * rank_chunk) but the [2D, 2D] step constants stay full-D
in VMEM, and the backward keeps an extra [2D,2D]-sized term per unrolled
step beyond 2 — `partials_real_vmem_bytes` models all three terms,
fitted to the measured r4+r5 boundary anchors (see its comment), and
`partials_unroll` clamps the auto unroll so the model fits. This tool:

  1. COMPILE-PROBES the chunked partials kernel at the guard's own picks
     across D = 320..512 to validate the fitted boundary on chip. The
     failure mode past it is a scoped-VMEM OOM surfaced as a helper
     HTTP-500 (readable cause, chip survives — observed r5).
  2. TIMES the frontier Ds (448, 512) at the guard's picks, fused (both
     precisions, streamed auto) vs the XLA factor scan at the same
     (T, B, value+grad, donated, readback) semantics.

Usage:  python tools/bigd_bench.py [--T 16385] [--iters 4]
            [--only probe|time|d512]
Writes BIGD_LOCAL.json (merge into RANKBENCH_r05.json by hand or via
--out).
"""
from __future__ import annotations

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
from audio_mps_tpu.ops.pallas_rank import (rank_chunk_for,
                                           rho_nll_rank_chunked)


def _copy(params):
    return jax.tree.map(lambda a: jnp.array(a, copy=True), params)


def compile_probe(D, B, T_probe=257, chunk=None):
    """Try ONE value+grad of the chunked partials kernel at tiny T.
    Returns (ok, rank_chunk_used, err). Default chunk = the guard's own
    pick (falls back to 64 where the guard declines, to probe beyond)."""
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B)
    chunk = chunk or rank_chunk_for(cfg, B, D) or 64
    params = init_rho(jax.random.PRNGKey(0), cfg)
    sig = damped_sine_batch(jax.random.PRNGKey(1), B, T_probe, cfg.delta_t)

    def loss(p):
        return rho_nll_rank_chunked(p, cfg, sig, rank_chunk=chunk,
                                    precision="highest")
    try:
        l, g = jax.value_and_grad(loss)(params)
        ok = bool(jnp.isfinite(l)) and all(
            bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
        return ok, chunk, None
    except Exception as e:
        return False, chunk, repr(e)[:200]


def time_case(cfg, B, T, iters, *, chunk=None, precision="highest",
              xla=False):
    params = init_rho(jax.random.PRNGKey(0), cfg)
    sig = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(p, s):
        if xla:
            from audio_mps_tpu.models.core import rho_nll_factor
            loss = lambda q: rho_nll_factor(q, cfg, s)
        else:
            def loss(q):
                return rho_nll_rank_chunked(q, cfg, s, rank_chunk=chunk,
                                            precision=precision)
        l, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, g), l

    p = _copy(params)
    p, l = step(p, sig)
    print(f"  warm loss={float(l):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, l = step(p, sig)
    lf = float(l)
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, lf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=16385)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--iters_d512", type=int, default=2)
    ap.add_argument("--only", choices=["probe", "time", "d512"],
                    default=None)
    ap.add_argument("--out", default="BIGD_LOCAL.json")
    args = ap.parse_args()
    out = {"T": args.T, "device": str(jax.devices()[0])}

    B = 4
    if args.only in (None, "probe"):
        # guard says: largest D whose guard admits a chunk
        for D in (256, 320, 384, 448, 512):
            cfg = CMPSConfig(bond_dim=D, minibatch_size=B)
            out[f"guard_chunk_D{D}"] = rank_chunk_for(cfg, B, D)
        print("guard picks:", {k: v for k, v in out.items()
                               if k.startswith("guard")}, flush=True)
        # measured: force the kernel past the guard (clean OOM expected
        # past the true boundary)
        for D in (320, 384, 448, 512):
            ok, chunk, err = compile_probe(D, B)
            out[f"probe_D{D}"] = {"ok": ok, "chunk": chunk, "err": err}
            print(f"probe D={D} chunk={chunk}: "
                  f"{'ok' if ok else err}", flush=True)
            if not ok:
                # past the boundary the failure mode is the same scoped-
                # VMEM OOM; don't poke the compile helper further
                break

    if args.only in (None, "time"):
        # time the frontier Ds at the guard's own picks, fused (both
        # precisions) vs the XLA factor scan
        for D_big in (448, 512):
            cfg = CMPSConfig(bond_dim=D_big, minibatch_size=B)
            chunk = rank_chunk_for(cfg, B, D_big)
            out[f"timed_chunk_D{D_big}"] = chunk
            if chunk is None:
                continue
            for prec in ("highest", "high"):
                it = args.iters if prec == "high" else max(
                    2, args.iters // 2)
                try:
                    ms, loss = time_case(cfg, B, args.T, it,
                                         chunk=chunk, precision=prec)
                    out[f"d{D_big}_fused_{prec}_ms"] = round(ms, 2)
                    out[f"d{D_big}_fused_{prec}_loss"] = round(loss, 5)
                    print(f"D={D_big} fused {prec}: {ms:.1f} ms",
                          flush=True)
                except Exception as e:
                    out[f"d{D_big}_fused_{prec}_error"] = repr(e)[:160]
                    print(f"D={D_big} fused {prec}: ERR {e!r}", flush=True)

    if args.only in (None, "d512"):
        for D_big in (448, 512):
            cfg = CMPSConfig(bond_dim=D_big, minibatch_size=B)
            try:
                ms, loss = time_case(cfg, B, args.T, args.iters_d512,
                                     xla=True)
                out[f"d{D_big}_xla_ms"] = round(ms, 2)
                out[f"d{D_big}_xla_loss"] = round(loss, 5)
                print(f"D={D_big} xla: {ms:.1f} ms", flush=True)
            except Exception as e:
                out[f"d{D_big}_xla_error"] = repr(e)[:160]
                print(f"D={D_big} xla: ERR {e!r}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
