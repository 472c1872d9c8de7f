"""Benchmark harness — prints ONE JSON line.

Metric: audio frames/sec/chip for a full training step (fwd + BPTT + Adam)
at bond dimension D=64 (the BASELINE.json north-star; the reference
publishes no numbers, BASELINE.md, so the baseline here is a direct
transcription of the reference semantics — lab-frame per-step phase
computation exactly as model.py:172-187 — run on the same chip with the
same chunked-remat scan; vs_baseline is the speedup of the optimized
rotating-frame path over that transcription).

Usage: python bench.py [--quick]
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import cell, core
from audio_mps_tpu.models.params import init_rho
from audio_mps_tpu.training import make_train_step
import optax


def lab_frame_nll(params, cfg, signals):
    """Reference-semantics baseline: per-step phases recomputed in the lab
    frame (as model.py:172-196), same chunked remat scan."""
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

    carry = (rr, ri, jnp.zeros((B,)), jnp.float32(0.0))
    T = incs.shape[0]
    chunk = cfg.scan_chunk
    n_full = T // chunk

    def plain(c, xs):
        return jax.lax.scan(step, c, xs)[0]

    inner = jax.checkpoint(plain)
    main = incs[: n_full * chunk].reshape((n_full, chunk, B))
    carry = jax.lax.scan(lambda c, xc: (inner(c, xc), None), carry, main)[0]
    if T % chunk:
        carry = plain(carry, incs[n_full * chunk:])
    return jnp.mean(carry[2])


def make_lab_train_step(cfg):
    opt = optax.adam(cfg.learning_rate)

    def loss_fn(params, batch):
        nll = lab_frame_nll(params, cfg, batch)
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
    """Force full execution. On the axon backend `block_until_ready` can
    return before remote execution finishes; a host readback is the only
    reliable barrier, so sum a leaf onto the host."""
    leaves = jax.tree.leaves(tree)
    return float(jnp.sum(leaves[0]))


def time_step(step, params, opt_state, batch, iters):
    # warmup/compile
    params, opt_state, out = step(params, opt_state, batch)
    _sync((params, out))
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, out = step(params, opt_state, batch)
    _sync((params, out))
    return (time.perf_counter() - t0) / iters


def main():
    quick = "--quick" in sys.argv
    D = 16 if quick else 64
    B = 8
    T = 4096 if quick else 16384
    iters = 2 if quick else 3
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=256)

    params = init_rho(jax.random.PRNGKey(0), cfg)
    batch = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)

    # Optimized path (rotating frame)
    _, fast_step = make_train_step("rho_mps", cfg)
    opt = optax.adam(cfg.learning_rate)
    t_fast = time_step(fast_step, params, opt.init(params), batch, iters)

    # Reference-transcription baseline (lab frame)
    _, lab_step = make_lab_train_step(cfg)
    params2 = init_rho(jax.random.PRNGKey(0), cfg)
    t_lab = time_step(lab_step, params2, opt.init(params2), batch, iters)

    frames_per_sec = B * T / t_fast
    baseline_fps = B * T / t_lab
    print(json.dumps({
        "metric": f"train_frames_per_sec_per_chip_D{D}",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / baseline_fps, 3),
        "detail": {
            "bond_dim": D, "batch": B, "T": T,
            "step_ms_optimized": round(t_fast * 1e3, 2),
            "step_ms_reference_transcription": round(t_lab * 1e3, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
