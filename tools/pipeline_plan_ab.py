"""A/B the fused temporal pipeline's memory-plan legs on the real chip.

The auto plan (parallel/time_pipeline._fused_pipeline_plan) only engages
remat/segmentation when the backward's residuals bust the HBM budgets;
this tool FORCES each leg at a budget-fitting shape so the overhead is
measurable, and ASSERTS the legs' losses agree (they are exact up to
the segment boundaries reordering the NLL summation).

Measured (v5e, rho D=64 B=8 full-rank T=16385, 1-stage mesh, M=1,
"highest", 2026-08-19): base 99.2 ms/step (== the bench pipeline row),
remat_ticks 129.8 (1.31x — the expected extra forward recompute),
tick_segment=2048 streamed 129.2 (1.30x — segmentation adds nothing over
remat), tick_segment non-streamed 151.9 (1.53x). Confirms the plan's
preference order: never remat when the budgets fit.

Usage: python tools/pipeline_plan_ab.py [--D=64] [--B=8] [--T=16385]
         [--iters=10] [--precision=highest] [--segment=2048]

Timing per the verify-skill rules: donated jit, mesh-committed params,
>=8 discarded warm calls, readback barrier.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models.params import init_rho
from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                  rho_nll_pipelined_fused)


def bench(cfg, sig, mesh, opt, iters, tag, **kw):
    p = jax.device_put(init_rho(jax.random.PRNGKey(1), cfg),
                       NamedSharding(mesh, P()))
    s = jax.device_put(opt.init(p), NamedSharding(mesh, P()))

    def step(p, s, x):
        l, g = jax.value_and_grad(lambda q: rho_nll_pipelined_fused(
            q, cfg, x, mesh, num_microbatches=1, **kw))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    stepj = jax.jit(step, donate_argnums=(0, 1))
    for _ in range(max(8, iters)):            # warm + transient discard
        p, s, l = stepj(p, s, sig)
    _ = float(l)                              # readback barrier
    t0 = time.time()
    for _ in range(iters):
        p, s, l = stepj(p, s, sig)
    lf = float(l)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{tag}: {ms:.2f} ms/step loss={lf:.4f}", flush=True)
    return ms, lf


def main(argv):
    kw = {"D": 64, "B": 8, "T": 16385, "iters": 10, "segment": 2048}
    precision = "highest"
    for a in argv:
        k, v = a.lstrip("-").split("=", 1)
        if k == "precision":
            precision = v
        elif k in kw:
            kw[k] = int(v)
        else:
            raise ValueError(f"unknown flag {a}")
    cfg = CMPSConfig(bond_dim=kw["D"], minibatch_size=kw["B"],
                     scan_chunk=0, kernel_precision=precision)
    sig = damped_sine_batch(jax.random.PRNGKey(3), kw["B"], kw["T"],
                            cfg.delta_t)
    mesh = make_time_mesh(1)
    opt = optax.adam(1e-3)
    it = kw["iters"]
    base, l0 = bench(cfg, sig, mesh, opt, it, "base (auto plan)")
    remat, l1 = bench(cfg, sig, mesh, opt, it, "remat_ticks",
                      remat_ticks=True)
    seg, l2 = bench(cfg, sig, mesh, opt, it,
                    f"tick_segment={kw['segment']}",
                    tick_segment=kw["segment"])
    segn, l3 = bench(cfg, sig, mesh, opt, it,
                     f"tick_segment={kw['segment']} nonstream",
                     tick_segment=kw["segment"], stream=False)
    # fp32 legs are EXACT — enforce it, don't just print it (segment
    # boundaries only reorder the NLL summation). Lower-precision passes
    # reorder that summation in bf16x3/bf16 arithmetic and the drift
    # compounds over the warm Adam steps, so loosen accordingly.
    rtol = 1e-5 if precision == "highest" else 1e-2
    for tag, lx in (("remat", l1), ("seg", l2), ("seg-nonstream", l3)):
        assert np.isclose(lx, l0, rtol=rtol), (tag, lx, l0)
    print(f"overhead: remat {remat / base:.3f}x seg {seg / base:.3f}x "
          f"seg-nonstream {segn / base:.3f}x (losses agree)")


if __name__ == "__main__":
    main(sys.argv[1:])
