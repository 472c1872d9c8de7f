"""Pallas fused-scan kernels vs the XLA scan path (interpret mode on CPU;
the same kernels compile to Mosaic on TPU — bench.py exercises that)."""
import dataclasses

import jax
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.ops.pallas_scan import (psi_nll_pallas, psi_sample_pallas,
                                           rho_nll_pallas, rho_sample_pallas)

HP = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0)
T = 300   # deliberately not a multiple of the kernel chunk


def _data():
    return damped_sine_batch(jax.random.PRNGKey(1), 4, T, HP.delta_t)


@pytest.mark.smoke
def test_psi_nll_kernel_matches_core():
    params = init_psi(jax.random.PRNGKey(3), HP)
    ref = float(core.psi_nll(params, HP, _data()))
    pal = float(psi_nll_pallas(params, HP, _data(), unroll=16,
                               interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)


def test_rho_nll_kernel_matches_core():
    params = init_rho(jax.random.PRNGKey(4), HP)
    ref = float(core.rho_nll(params, HP, _data()))
    pal = float(rho_nll_pallas(params, HP, _data(), unroll=16,
                               interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)


def test_rho_nll_kernel_low_rank():
    hp = dataclasses.replace(HP, initial_rank=3)
    params = init_rho(jax.random.PRNGKey(5), hp)
    ref = float(core.rho_nll(params, hp, _data()))
    pal = float(rho_nll_pallas(params, hp, _data(), unroll=8,
                               interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rank", [None, 3])
def test_rho_sampler_kernel_matches_core(rank):
    hp = dataclasses.replace(HP, initial_rank=rank)
    params = init_rho(jax.random.PRNGKey(6), hp)
    noise = 1e-4 * jax.random.normal(jax.random.PRNGKey(9), (T, 4))
    ref = np.asarray(core.sample_rho_with_noise(params, hp, noise))
    pal = np.asarray(rho_sample_pallas(params, hp, noise, unroll=16,
                                       interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-5)


def test_psi_sampler_kernel_matches_core():
    params = init_psi(jax.random.PRNGKey(7), HP)
    noise = 1e-4 * jax.random.normal(jax.random.PRNGKey(9), (T, 4))
    ref = np.asarray(core.sample_psi_with_noise(params, HP, noise))
    pal = np.asarray(psi_sample_pallas(params, HP, noise, unroll=16,
                                       interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("unroll", [16, 64])
def test_psi_nll_defer_norm_matches(unroll):
    """Deferred-normalization variant is exact (normalization commutes
    with the linear update; e_t = ehat_t / n2hat_{t-1})."""
    params = init_psi(jax.random.PRNGKey(3), HP)
    ref = float(core.psi_nll(params, HP, _data()))
    v2 = float(psi_nll_pallas(params, HP, _data(), unroll=unroll,
                              interpret=True, defer_norm=True))
    np.testing.assert_allclose(v2, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rank", [None, 3])
def test_rho_nll_defer_norm_matches(rank):
    hp = dataclasses.replace(HP, initial_rank=rank)
    params = init_rho(jax.random.PRNGKey(4), hp)
    ref = float(core.rho_nll_factor(params, hp, _data()))
    v2 = float(rho_nll_pallas(params, hp, _data(), unroll=32,
                              interpret=True, defer_norm=True))
    np.testing.assert_allclose(v2, ref, rtol=1e-5, atol=1e-6)


def test_sampler_precision_follows_config():
    """precision=None resolves to cfg.kernel_precision (a model trained
    in the bf16x3 'high' mode samples in it too — r4: at MXU-bound D the
    fused sampler's win over the XLA scan IS the precision mode). Pinned
    via the split-fallback downgrade warning: D=12 is a valid block-
    TRAINING config (D%4==0) whose sampler falls back to split (D%8!=0),
    which warns iff the resolved precision is 'high'."""
    import warnings as warnings_mod

    cfg_hi = CMPSConfig(bond_dim=12, minibatch_size=2,
                        kernel_precision="high")
    params = init_psi(jax.random.PRNGKey(0), cfg_hi)
    noise = 1e-3 * np.random.RandomState(0).randn(17, 2).astype(np.float32)
    with pytest.warns(UserWarning, match="split fallback"):
        w = psi_sample_pallas(params, cfg_hi, jax.numpy.asarray(noise),
                              interpret=True)
    assert np.all(np.isfinite(np.asarray(w)))

    # default-precision config: no downgrade warning, same call
    cfg_def = dataclasses.replace(cfg_hi, kernel_precision="highest")
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        w2 = psi_sample_pallas(params, cfg_def, jax.numpy.asarray(noise),
                               interpret=True)
    assert not [c for c in caught if "split fallback" in str(c.message)]
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-6)
