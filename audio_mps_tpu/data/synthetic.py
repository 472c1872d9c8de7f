"""Synthetic damped-sine dataset.

Rebuild of the reference's ``damped_sine`` branch (reference: data.py:8-22):
a middle-C (261.6 Hz) sine with 0.1 s exponential decay, gated on at a
per-example random onset delay drawn from Gamma(alpha=2, beta=2/delay_time)
with delay_time = T/100 (in sample units). As in the reference, the
synthetic path doubles as the hermetic test fixture
(reference tests/test_data.py:12-16).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CMPSConfig

MIDDLE_C_HZ = 261.6
DECAY_TIME_S = 0.1


def damped_sine_batch(key, batch_size: int, sample_duration: int,
                      delta_t: float, freq_hz=MIDDLE_C_HZ) -> jnp.ndarray:
    """One [batch_size, sample_duration] batch of damped sines with random
    onset delays (reference: data.py:8-22). `freq_hz` may be a scalar or a
    per-example [batch_size] array (multi-pitch batches for the latent
    family's quality anchor — tools/latent_check.py)."""
    delay_time = sample_duration / 100.0
    # Gamma(alpha=2, beta=2/delay_time): jax.random.gamma is standard
    # (scale 1), so scale by 1/beta = delay_time/2.
    delays = jax.random.gamma(key, 2.0, (batch_size, 1)) * (delay_time / 2.0)
    n = jnp.arange(sample_duration, dtype=jnp.float32)[None, :]
    times = (n - delays) * delta_t
    gate = 0.5 * (jnp.sign(times) + 1.0)
    f = jnp.reshape(jnp.asarray(freq_hz, jnp.float32), (-1, 1))
    wave = gate * jnp.sin(2.0 * jnp.pi * f * times) \
        * jnp.exp(-times / DECAY_TIME_S)
    return wave.astype(jnp.float32)


def multi_pitch_batch(key, batch_size: int, sample_duration: int,
                      delta_t: float, freqs_hz):
    """Damped-sine batch with per-example pitch drawn uniformly from
    `freqs_hz`; returns (waves [B, T], labels [B] — indices into
    freqs_hz). The latent family's two-pitch anchor dataset."""
    kf, kd = jax.random.split(key)
    freqs_hz = jnp.asarray(freqs_hz, jnp.float32)
    labels = jax.random.randint(kf, (batch_size,), 0, freqs_hz.shape[0])
    waves = damped_sine_batch(kd, batch_size, sample_duration, delta_t,
                              freq_hz=freqs_hz[labels])
    return waves, labels


def damped_sine_iterator(cfg: CMPSConfig, sample_duration: int, seed: int = 0):
    """Infinite iterator of fresh batches (each batch uses a new key)."""
    key = jax.random.PRNGKey(seed)
    fn = jax.jit(damped_sine_batch, static_argnums=(1, 2, 3))
    while True:
        key, sub = jax.random.split(key)
        yield fn(sub, cfg.minibatch_size, sample_duration, cfg.delta_t)
