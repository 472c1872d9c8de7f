"""Benchmark harness — prints ONE JSON line.

Primary metric: audio frames/sec/chip for a full training step (forward +
BPTT + Adam) at bond dimension D=64, batch 8 (the BASELINE.json
north-star). The reference publishes no numbers (BASELINE.md), so
`vs_baseline` compares against a direct transcription of the reference
semantics — lab-frame per-step phase recomputation exactly as
model.py:172-196 — run on the same chip with the same chunked-remat scan.
The optimized path is the rotating-frame purification-factor scan
(models/core.py:rho_nll_factor), the training default.

Also reported in `detail`: sampler throughput (samples x steps / sec) and
the psi-model training rate.

Timing uses host readbacks — on this backend `block_until_ready` returns
before remote execution finishes (a ~700x undercount; see
.claude/skills/verify/SKILL.md).

Usage: python bench.py [--quick]
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.reference_transcription import rho_nll_lab_frame
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.training import make_train_step


def make_lab_train_step(cfg):
    opt = optax.adam(cfg.learning_rate)

    def loss_fn(params, batch):
        nll = rho_nll_lab_frame(params, cfg, batch)
        total, _ = core.regularized_loss(nll, params, cfg)
        return total

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return opt, step


def _sync(tree):
    """Host readback = the only reliable execution barrier on axon."""
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def time_train_step(step, params, opt_state, batch, iters):
    params, opt_state, out = step(params, opt_state, batch)
    _sync((params,))
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, out = step(params, opt_state, batch)
    _sync((params,))
    return (time.perf_counter() - t0) / iters


def time_fn(f, *args, iters=3):
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    quick = "--quick" in sys.argv
    D = 16 if quick else 64
    B = 8
    T = 4096 if quick else 16384
    iters = 2 if quick else 3
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=256)

    batch = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)

    # Optimized training path: Pallas fused fwd+bwd kernels (auto on TPU)
    params = init_rho(jax.random.PRNGKey(0), cfg)
    opt, fast_step = make_train_step("rho_mps", cfg)
    t_fast = time_train_step(fast_step, params, opt.init(params), batch,
                             iters)

    # bf16 fast mode (kernel_precision=default: 3.3x at D=64, loss
    # rel-err ~1e-3 — opt-in, convergence verified)
    cfg_bf = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=256,
                        kernel_precision="default")
    params_bf = init_rho(jax.random.PRNGKey(0), cfg_bf)
    opt_bf, bf_step = make_train_step("rho_mps", cfg_bf)
    t_bf = time_train_step(bf_step, params_bf, opt_bf.init(params_bf),
                           batch, iters)

    # XLA-scan training path (factor form) for comparison
    params_x = init_rho(jax.random.PRNGKey(0), cfg)
    opt_x, xla_step = make_train_step("rho_mps", cfg, fused=False)
    t_xla = time_train_step(xla_step, params_x, opt_x.init(params_x), batch,
                            iters)

    # psi-model training rate
    psi_params = init_psi(jax.random.PRNGKey(0), cfg)
    opt_p, psi_step = make_train_step("psi_mps", cfg)
    t_psi = time_train_step(psi_step, psi_params, opt_p.init(psi_params),
                            batch, iters)

    # wide-batch throughput config: the fused kernels are latency-bound at
    # B=8 (8 of 128 lanes), so filling lanes is near-free throughput
    B_wide = 64
    cfg_w = CMPSConfig(bond_dim=D, minibatch_size=B_wide, scan_chunk=256)
    batch_w = damped_sine_batch(jax.random.PRNGKey(1), B_wide, T,
                                cfg_w.delta_t)
    psi_params_w = init_psi(jax.random.PRNGKey(0), cfg_w)
    opt_w, psi_step_w = make_train_step("psi_mps", cfg_w)
    t_psi_w = time_train_step(psi_step_w, psi_params_w,
                              opt_w.init(psi_params_w), batch_w, iters)

    # Reference-transcription baseline (lab frame, density matrix)
    params2 = init_rho(jax.random.PRNGKey(0), cfg)
    opt2, lab_step = make_lab_train_step(cfg)
    t_lab = time_train_step(lab_step, params2, opt2.init(params2), batch,
                            iters)

    # Sampler throughput (XLA scan path), N=8 parallel chains
    params3 = init_rho(jax.random.PRNGKey(0), cfg)
    noise = 1e-4 * jax.random.normal(jax.random.PRNGKey(2), (T, B))
    samp = jax.jit(lambda p, z: core.sample_rho_with_noise(p, cfg, z))
    t_samp = time_fn(samp, params3, noise, iters=iters)

    # Pallas fused kernels (forward NLL + sampler). NOTE: the first Mosaic
    # compile in a session costs ~3 min on this backend; subsequent ~1 s.
    kernel_detail = {}
    try:
        from audio_mps_tpu.ops.pallas_scan import (rho_nll_pallas,
                                                   rho_sample_pallas)
        knll = jax.jit(partial(rho_nll_pallas, cfg=cfg, interpret=False))
        t_knll = time_fn(lambda b: knll(params3, signals=b), batch,
                         iters=iters)
        ksam = jax.jit(partial(rho_sample_pallas, cfg=cfg, interpret=False))
        t_ksam = time_fn(lambda z: ksam(params3, noise=z), noise,
                         iters=iters)
        # throughput config: batch the sample chains across the full lane
        # width (generation is serial in time; parallel in chains)
        n_wide = 128 // max(1, cfg.bond_dim // 8)  # keep VMEM bounded
        noise_w = 1e-4 * jax.random.normal(jax.random.PRNGKey(3),
                                           (T, n_wide))
        t_kwide = time_fn(lambda z: ksam(params3, noise=z), noise_w,
                          iters=iters)
        kernel_detail = {
            "pallas_nll_fwd_ms": round(t_knll * 1e3, 2),
            "pallas_sampler_steps_per_sec": round(B * T / t_ksam, 1),
            f"pallas_sampler_steps_per_sec_N{n_wide}":
                round(n_wide * T / t_kwide, 1),
        }
    except Exception as e:   # keep bench robust on non-TPU backends
        kernel_detail = {"pallas_error": str(e)[:120]}

    frames_per_sec = B * T / t_fast
    baseline_fps = B * T / t_lab
    print(json.dumps({
        "metric": f"train_frames_per_sec_per_chip_D{D}",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / baseline_fps, 3),
        "detail": {
            "bond_dim": D, "batch": B, "T": T,
            "train_step_ms_fused": round(t_fast * 1e3, 2),
            "train_step_ms_fused_bf16": round(t_bf * 1e3, 2),
            "train_step_ms_xla_factor": round(t_xla * 1e3, 2),
            "train_step_ms_psi": round(t_psi * 1e3, 2),
            f"train_frames_per_sec_psi_B{B_wide}":
                round(B_wide * T / t_psi_w, 1),
            "train_step_ms_reference_transcription": round(t_lab * 1e3, 2),
            "sampler_steps_per_sec": round(B * T / t_samp, 1),
            "device": str(jax.devices()[0]),
            **kernel_detail,
        },
    }))


if __name__ == "__main__":
    main()
