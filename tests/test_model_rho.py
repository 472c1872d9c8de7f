"""RhoCMPS tests: ports of the reference suite (reference:
tests/test_model.py:31-103) plus the new-framework anchors — rotating-frame
vs lab-frame equivalence, chunked-scan invariance, and gradient checks that
the reference lacks (SURVEY.md §4 gaps)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_mps_tpu import CMPSConfig, RhoCMPS
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import cell, core, reference_transcription
from audio_mps_tpu.models.params import init_rho

HP = CMPSConfig(minibatch_size=8, bond_dim=7, delta_t=1 / 16000, sigma=1e-4,
                initial_rank=None, A=100.0,
                h_reg=2 / (np.pi * 16000) ** 2, r_reg=2 / (np.pi * 16000))
T_SHORT = 2 ** 8


def small_data(T=T_SHORT, B=HP.minibatch_size):
    return damped_sine_batch(jax.random.PRNGKey(1), B, T, HP.delta_t)


def test_R_has_no_diagonal_elements():
    # reference tests/test_model.py:19-25
    model = RhoCMPS(HP)
    np.testing.assert_allclose(np.diag(model.R), np.zeros(HP.bond_dim))


@pytest.mark.smoke
def test_loss_not_nan():
    # reference tests/test_model.py:33-39
    model = RhoCMPS(HP, data_iterator=small_data())
    assert np.isfinite(float(model.loss))


def test_R_diag_quirk_deviation_confined_to_warm_starts():
    """Documented parity deviation (PARITY.md): the reference's
    ``R -= matrix_diag_part(R)`` (reference: model.py:42) broadcasts over
    the last axis, shifting column j by R_jj everywhere; we zero only the
    diagonal. The two semantics coincide exactly iff R_in has a zero
    diagonal — i.e. the deviation is confined to nonzero-diagonal R_in
    warm starts."""
    rng = np.random.default_rng(0)
    d = HP.bond_dim
    data = small_data()

    def loss_with(R_complex):
        p = init_rho(jax.random.PRNGKey(0), HP, R_in=R_complex)
        return float(core.rho_nll(p, HP, data))

    R = (rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d)))
    R_refquirk = R - np.diag(R)[None, :]       # the reference's broadcast
    R_zerodiag = R - np.diag(np.diag(R))       # our semantics

    # nonzero diagonal: the semantics genuinely differ...
    assert abs(loss_with(R_refquirk) - loss_with(R_zerodiag)) > 1e-6
    # ...and our effective R depends on R_in only through its off-diagonal
    # + zeroed diagonal, so feeding R or R_zerodiag is identical
    np.testing.assert_allclose(loss_with(R), loss_with(R_zerodiag), rtol=0)

    # zero-diagonal warm start: reference quirk is the identity -> semantics
    # coincide exactly
    np.testing.assert_allclose(
        loss_with(R_zerodiag - np.diag(np.diag(R_zerodiag))),
        loss_with(R_zerodiag), rtol=0)


def test_rho0_is_density_matrix():
    # reference tests/test_model.py:41-48
    model = RhoCMPS(HP)
    rho0 = model.rho_0
    np.testing.assert_allclose(np.trace(rho0).real, 1.0, rtol=1e-5)
    np.testing.assert_allclose(rho0, rho0.conj().T, atol=1e-6)
    evals = np.linalg.eigvalsh(rho0)
    assert (evals > -1e-6).all()


def test_rho_evolved_with_data_remains_normalized():
    # reference tests/test_model.py:50-57
    model = RhoCMPS(HP, data_iterator=small_data())
    traj = model.rho_evolve_with_data()
    traces = np.trace(traj, axis1=-2, axis2=-1)
    np.testing.assert_allclose(traces.real, np.ones_like(traces.real),
                               rtol=1e-5)
    assert np.abs(traces.imag).max() < 1e-5


def test_rho_evolved_sampling_remains_normalized():
    # reference tests/test_model.py:59-67
    model = RhoCMPS(HP)
    traj = model.rho_evolve_with_sampling(num_samples=5, length=T_SHORT)
    traces = np.trace(traj, axis1=-2, axis2=-1)
    np.testing.assert_allclose(traces.real, np.ones((5, T_SHORT)), rtol=1e-4)


def test_trivial_update_of_ancilla():
    # reference tests/test_model.py:69-83: H=R=0 => one update is identity
    model = RhoCMPS(HP, freqs_in=np.zeros(HP.bond_dim, np.float32),
                    R_in=np.zeros((HP.bond_dim, HP.bond_dim), np.complex64))
    rho0 = model.rho_0
    B = HP.minibatch_size
    rr = jnp.broadcast_to(jnp.asarray(rho0.real), (B,) + rho0.shape)
    ri = jnp.broadcast_to(jnp.asarray(rho0.imag), (B,) + rho0.shape)
    signal = jnp.asarray(np.random.RandomState(0).rand(B).astype(np.float32))
    nr, ni = cell.lab_update_ancilla_rho(model.params, HP, rr, ri, signal, 0.0)
    np.testing.assert_allclose(np.asarray(nr), np.asarray(rr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ni), np.asarray(ri), atol=1e-6)


def test_qubit_sampling_shape():
    # reference tests/test_model.py:85-103: two-level analytic fixture
    hp = dataclasses.replace(HP, bond_dim=2, sigma=1.0, A=1.0)
    R = np.array([[0, 1], [0, 0]], dtype=np.complex64)
    freqs = np.array([10.0, -10.0], dtype=np.float32)
    qubit = RhoCMPS(hp, R_in=R, freqs_in=freqs)
    waveform = qubit.sample(num_samples=2, length=512)
    assert waveform.shape == (2, 512)
    assert np.isfinite(waveform).all()


# ---------------------------------------------------------------------------
# New-framework anchors (beyond the reference suite)
# ---------------------------------------------------------------------------

def test_rotating_frame_matches_lab_frame():
    """The rotating-frame hot path must agree with the direct (reference
    semantics) lab-frame evolution."""
    params = init_rho(jax.random.PRNGKey(3), HP)
    data = small_data()
    cfg = dataclasses.replace(HP, scan_chunk=0)
    fast = float(core.rho_nll(params, cfg, data))
    ref = float(reference_transcription.rho_nll_lab_frame(params, cfg, data))
    np.testing.assert_allclose(fast, ref, rtol=2e-4)


def test_chunked_scan_matches_plain():
    params = init_rho(jax.random.PRNGKey(4), HP)
    data = small_data()
    plain = float(core.rho_nll(params, dataclasses.replace(HP, scan_chunk=0),
                               data))
    # chunk not dividing T-1=255 exercises the tail path
    chunked = float(core.rho_nll(
        params, dataclasses.replace(HP, scan_chunk=64), data))
    np.testing.assert_allclose(chunked, plain, rtol=1e-6)


def test_gradients_finite_and_chunk_invariant():
    params = init_rho(jax.random.PRNGKey(5), HP)
    data = small_data()
    g_plain = jax.grad(core.rho_nll)(
        params, dataclasses.replace(HP, scan_chunk=0), data)
    g_chunk = jax.grad(core.rho_nll)(
        params, dataclasses.replace(HP, scan_chunk=64), data)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_chunk)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_purity_bounds():
    model = RhoCMPS(HP)
    p = model.purity(num_samples=3, length=64)
    assert p.shape == (3, 64)
    d = HP.bond_dim
    assert (p > 1.0 / d - 1e-5).all() and (p < 1.0 + 1e-4).all()


def test_sample_reproducible_with_key():
    model = RhoCMPS(HP)
    key = jax.random.PRNGKey(7)
    w1 = model.sample(2, 128, key=key)
    w2 = model.sample(2, 128, key=key)
    np.testing.assert_array_equal(w1, w2)


def test_factor_nll_matches_matrix():
    """Purification-factor evolution == density-matrix evolution (value and
    gradients); the factor form is the training default."""
    params = init_rho(jax.random.PRNGKey(6), HP)
    data = small_data()
    m = float(core.rho_nll(params, HP, data))
    f = float(core.rho_nll_factor(params, HP, data))
    np.testing.assert_allclose(f, m, rtol=1e-5)
    gm = jax.grad(core.rho_nll)(params, HP, data)
    gf = jax.grad(core.rho_nll_factor)(params, HP, data)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_factor_nll_low_rank():
    hp = dataclasses.replace(HP, initial_rank=2)
    params = init_rho(jax.random.PRNGKey(7), hp)
    data = small_data()
    np.testing.assert_allclose(float(core.rho_nll_factor(params, hp, data)),
                               float(core.rho_nll(params, hp, data)),
                               rtol=1e-5)


def test_sampler_statistics_with_zero_R():
    """With R=0 the drift vanishes and the sampler must reproduce
    A*cumsum(noise) exactly (Euler-Maruyama semantics, model.py:160-167)."""
    hp = dataclasses.replace(HP, sigma=1.0, A=2.0)
    model = RhoCMPS(hp, freqs_in=np.zeros(HP.bond_dim, np.float32),
                    R_in=np.zeros((HP.bond_dim, HP.bond_dim), np.complex64))
    noise = jax.random.normal(jax.random.PRNGKey(11), (200, 3)) * 0.1
    w = np.asarray(core.sample_rho_with_noise(model.params, hp, noise))
    expected = 2.0 * np.cumsum(np.asarray(noise), axis=0).T
    np.testing.assert_allclose(w, expected, rtol=1e-5, atol=1e-6)


def test_bond_dim_128():
    """BASELINE configs[4] bond dimension: D=128 trains (tiny T)."""
    hp = CMPSConfig(minibatch_size=2, bond_dim=128, scan_chunk=16)
    from audio_mps_tpu.training import init_params_for, make_train_step
    params = init_params_for("rho_mps", jax.random.PRNGKey(0), hp)
    opt, step = make_train_step("rho_mps", hp)
    o = opt.init(params)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 2, 64, hp.delta_t)
    params, o, m = step(params, o, batch)
    assert np.isfinite(float(m["model_loss"]))


def test_pscan_matches_sequential():
    """Parallel-in-time NLL (associative scan over transfer operators) ==
    sequential factor scan, values and gradients."""
    cfg = dataclasses.replace(HP, minibatch_size=4, scan_chunk=0)
    params = init_rho(jax.random.PRNGKey(8), cfg)
    data = small_data(T=161, B=4)
    ref = float(core.rho_nll_factor(params, cfg, data))
    for tc in [32, 200]:   # chunked + single-chunk-with-remainder paths
        v = float(core.rho_nll_pscan(params, cfg, data, time_chunk=tc))
        np.testing.assert_allclose(v, ref, rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(core.rho_nll_factor)(params, cfg, data)
    g_ps = jax.grad(
        lambda p: core.rho_nll_pscan(p, cfg, data, time_chunk=64))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_pscan_gradient_long_T_default_chunk_bounded_memory():
    """jax.grad through rho_nll_pscan at T=8192 with the DEFAULT time_chunk
    must work (chunk bodies are jax.checkpoint'ed, so reverse-mode
    recomputes one chunk at a time instead of materializing the padded
    trajectory — VERDICT r1 item 6) and match the sequential factor scan."""
    cfg = CMPSConfig(minibatch_size=2, bond_dim=4, scan_chunk=512)
    params = init_rho(jax.random.PRNGKey(8), cfg)
    data = damped_sine_batch(jax.random.PRNGKey(1), 2, 8192 + 1, cfg.delta_t)
    g_ref = jax.jit(jax.grad(
        lambda p: core.rho_nll_factor(p, cfg, data)))(params)
    g_ps = jax.jit(jax.grad(
        lambda p: core.rho_nll_pscan(p, cfg, data)))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_pscan_rescaling_under_large_updates():
    """The per-combine rescaling must keep 65k-step-scale products in fp32
    range: use a long T with sigma=1 (strong updates)."""
    hp = dataclasses.replace(HP, sigma=0.5, A=1.0, scan_chunk=0)
    params = init_rho(jax.random.PRNGKey(9), hp)
    data = small_data(T=1024) * 0.05
    ref = float(core.rho_nll_factor(params, hp, data))
    v = float(core.rho_nll_pscan(params, hp, data, time_chunk=256))
    np.testing.assert_allclose(v, ref, rtol=1e-4, atol=1e-5)
