"""PsiCMPS tests (reference: tests/test_model.py:105-158) plus
rotating-frame and gradient anchors."""
import dataclasses
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from audio_mps_tpu import CMPSConfig, PsiCMPS
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import cell, core, reference_transcription
from audio_mps_tpu.models.params import init_psi

HP = CMPSConfig(minibatch_size=8, bond_dim=7, delta_t=1 / 16000, sigma=1e-4,
                initial_rank=None, A=100.0,
                h_reg=2 / (np.pi * 16000) ** 2, r_reg=2 / (np.pi * 16000))
T_SHORT = 2 ** 8


def small_data(T=T_SHORT, B=HP.minibatch_size):
    return damped_sine_batch(jax.random.PRNGKey(1), B, T, HP.delta_t)


def test_loss_not_nan():
    # reference tests/test_model.py:107-113
    model = PsiCMPS(HP, data_iterator=small_data())
    assert np.isfinite(float(model.loss))


def test_psi0_normalized():
    model = PsiCMPS(HP)
    np.testing.assert_allclose(np.linalg.norm(model.psi_0), 1.0, rtol=1e-6)


def test_psi_evolved_with_data_remains_normalized():
    # reference tests/test_model.py:115-122
    model = PsiCMPS(HP, data_iterator=small_data())
    traj = model.psi_evolve_with_data()
    norms = np.linalg.norm(traj, axis=-1)
    np.testing.assert_allclose(norms, np.ones_like(norms), rtol=1e-5)


def test_trivial_update_of_ancilla():
    # reference tests/test_model.py:124-138
    model = PsiCMPS(HP, freqs_in=np.zeros(HP.bond_dim, np.float32),
                    R_in=np.zeros((HP.bond_dim, HP.bond_dim), np.complex64))
    psi0 = model.psi_0
    B = HP.minibatch_size
    pr = jnp.broadcast_to(jnp.asarray(psi0.real), (B,) + psi0.shape)
    pi = jnp.broadcast_to(jnp.asarray(psi0.imag), (B,) + psi0.shape)
    signal = jnp.asarray(np.random.RandomState(0).rand(B).astype(np.float32))
    nr, ni = cell.lab_update_ancilla_psi(model.params, HP, pr, pi, signal, 0.0)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(pr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(pi), atol=1e-6)


def test_qubit_sampling_shape():
    # reference tests/test_model.py:140-158
    hp = dataclasses.replace(HP, bond_dim=2, sigma=1.0, A=1.0)
    R = np.array([[0, 1], [0, 0]], dtype=np.complex64)
    freqs = np.array([10.0, -10.0], dtype=np.float32)
    qubit = PsiCMPS(hp, R_in=R, freqs_in=freqs)
    waveform = qubit.sample(num_samples=2, length=512)
    assert waveform.shape == (2, 512)
    assert np.isfinite(waveform).all()


def test_warm_start_psi_in_works():
    """The reference's psi_in path raises NameError (model.py:215-216); the
    rebuilt framework must accept it."""
    psi_in = (np.arange(HP.bond_dim) + 1).astype(np.complex64)
    model = PsiCMPS(HP, psi_in=psi_in)
    expected = psi_in / np.linalg.norm(psi_in)
    np.testing.assert_allclose(model.psi_0, expected, rtol=1e-6)


# ---------------------------------------------------------------------------
# New-framework anchors
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_rotating_frame_matches_lab_frame():
    params = init_psi(jax.random.PRNGKey(3), HP)
    data = small_data()
    cfg = dataclasses.replace(HP, scan_chunk=0)
    fast = float(core.psi_nll(params, cfg, data))
    ref = float(reference_transcription.psi_nll_lab_frame(params, cfg, data))
    np.testing.assert_allclose(fast, ref, rtol=2e-4)


def test_gradients_finite_and_chunk_invariant():
    params = init_psi(jax.random.PRNGKey(5), HP)
    data = small_data()
    g_plain = jax.grad(core.psi_nll)(
        params, dataclasses.replace(HP, scan_chunk=0), data)
    g_chunk = jax.grad(core.psi_nll)(
        params, dataclasses.replace(HP, scan_chunk=64), data)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_chunk)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_reference_nan_semantics_with_log_eps_zero():
    """cfg.log_eps <= 0 reproduces the reference's silent NaN when
    1 + <x> * s/A <= 0 (reference model.py:169-170 has no clamp)."""
    hp = dataclasses.replace(HP, log_eps=0.0, sigma=1.0, A=0.01,
                             scan_chunk=0)
    params = init_psi(jax.random.PRNGKey(3), hp)
    # huge increments relative to A force the log argument negative
    data = jnp.asarray(np.linspace(0, 50, 64, dtype=np.float32))[None, :]
    data = jnp.tile(data, (hp.minibatch_size, 1))
    loss = float(core.psi_nll(params, hp, data))
    assert np.isnan(loss)
    # the default clamp keeps it finite
    hp2 = dataclasses.replace(hp, log_eps=1e-8)
    assert np.isfinite(float(core.psi_nll(params, hp2, data)))
