"""Latent-conditioned cMPS tests (the reference's follow_vae.py is broken
WIP — these pin the working rebuild)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models.latent import (decode_psi0, elbo_loss, encode,
                                         init_latent, sample_latent)

CFG = CMPSConfig(minibatch_size=4, bond_dim=4, scan_chunk=64)
T = 128


def _data(B=4):
    return damped_sine_batch(jax.random.PRNGKey(1), B, T, CFG.delta_t)


@pytest.mark.smoke
def test_encoder_shapes_and_kl_nonneg():
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=6)
    mu, lv = encode(params, _data())
    assert mu.shape == (4, 6) and lv.shape == (4, 6)
    loss, aux = elbo_loss(params, CFG, _data(), jax.random.PRNGKey(2))
    assert float(aux["kl"]) >= 0.0
    assert np.isfinite(float(loss))


def test_free_bits_floor():
    """latent_free_bits (cfg knob, r5): the loss-side KL gets a
    per-dimension floor — below it the loss is CONSTANT in the encoder
    (no collapse pressure), above it the ELBO is unchanged; the reported
    aux KL is always the true KL."""
    import dataclasses

    from audio_mps_tpu.models.latent import kl_terms

    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=6)
    key = jax.random.PRNGKey(2)
    lam = 0.25

    # kl_terms semantics
    mu = jnp.zeros((3, 6))
    lv = jnp.zeros((3, 6))             # exactly the prior: true KL = 0
    kl, kl_loss = kl_terms(mu, lv, lam)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(kl_loss), 6 * lam, rtol=1e-6)
    # far from the prior the floor is inactive: kl_loss == kl
    mu2 = 3.0 * jnp.ones((3, 6))
    kl2, kl_loss2 = kl_terms(mu2, lv, lam)
    np.testing.assert_allclose(np.asarray(kl2), np.asarray(kl_loss2))

    # at the prior, the floored ELBO's encoder-KL gradient vanishes
    # (the recon term still feeds the encoder, so compare KL-only)
    def kl_only(m):
        return jnp.mean(kl_terms(m, lv, lam)[1])
    g = jax.grad(kl_only)(mu)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    assert float(jax.grad(lambda m: jnp.mean(kl_terms(m, lv, 0.0)[1]))(
        mu2).max()) > 0.0

    # end-to-end: the cfg knob changes only the KL side of the loss
    cfg_fb = dataclasses.replace(CFG, latent_free_bits=lam,
                                 latent_beta=0.5)
    cfg_0 = dataclasses.replace(CFG, latent_beta=0.5)
    from audio_mps_tpu.training import make_latent_loss_fn
    (l_fb, aux_fb) = make_latent_loss_fn(cfg_fb)(params, _data(), key)
    (l_0, aux_0) = make_latent_loss_fn(cfg_0)(params, _data(), key)
    np.testing.assert_allclose(float(aux_fb["kl"]), float(aux_0["kl"]),
                               rtol=1e-6)
    assert float(l_fb) >= float(l_0) - 1e-6   # floor only adds
    with pytest.raises(ValueError, match="latent_free_bits"):
        dataclasses.replace(CFG, latent_free_bits=-0.1)


def test_decoded_psi0_normalized():
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=6)
    z = jax.random.normal(jax.random.PRNGKey(3), (5, 6))
    pr, pi = decode_psi0(params, z, CFG)
    norms = np.sqrt(np.asarray((pr ** 2 + pi ** 2).sum(-1)))
    np.testing.assert_allclose(norms, np.ones(5), rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["log", "quadratic"])
def test_elbo_trains(loss_type):
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=4, hidden=32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    data = _data()

    @jax.jit
    def step(params, opt_state, key):
        (loss, aux), grads = jax.value_and_grad(
            elbo_loss, has_aux=True)(params, CFG, data, key,
                                     loss_type=loss_type)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_prior_sampling():
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=4)
    w = sample_latent(params, CFG, jax.random.PRNGKey(5), 3, 128)
    assert w.shape == (3, 128)
    assert np.isfinite(np.asarray(w)).all()
    # different latents -> different waveforms
    assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))


@pytest.mark.parametrize("bond_dim", [4, 8])
def test_fused_sampler_matches_xla(bond_dim):
    """sample_latent(fused=True) — the per-example-psi0 fused SDE sampler
    kernels (split at D=4, block at D=8) — reproduces the XLA scan sampler
    exactly (same key -> same noise -> same waveforms)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, bond_dim=bond_dim)
    params = init_latent(jax.random.PRNGKey(0), cfg, latent_dim=4)
    key = jax.random.PRNGKey(11)
    w_ref = np.asarray(sample_latent(params, cfg, key, 3, 96))
    w_fus = np.asarray(sample_latent(params, cfg, key, 3, 96, fused=True))
    assert w_fus.shape == (3, 96)
    np.testing.assert_allclose(w_fus, w_ref, rtol=2e-4, atol=1e-7)


def test_dp_sample_threads_temperature():
    """Temperature reaches the SDE through the SHARDED latent sampler
    (parallel.make_dp_sample build(..., temp=...)): hot chains must carry
    strictly more high-frequency noise energy than near-deterministic
    cold chains from the same key."""
    from audio_mps_tpu.parallel import make_dp_sample, make_mesh, replicate
    mesh = make_mesh()
    params = replicate(init_latent(jax.random.PRNGKey(0), CFG,
                                   latent_dim=4), mesh)
    build = make_dp_sample("latent", CFG, mesh)
    key = jax.random.PRNGKey(5)
    w_cold = np.asarray(build(8, 64, temp=1e-12)(params, key))
    w_hot = np.asarray(build(8, 64, temp=1e12)(params, key))
    diff_energy = lambda w: float(np.abs(np.diff(w, axis=1)).sum())
    assert diff_energy(w_hot) > 10 * diff_energy(w_cold)


def test_fused_recon_per_example_matches_unfused():
    """recon_loss(fused=True) returns TRUE per-example losses (not a
    broadcast batch mean), matching fused=False element-wise, and its VJP
    handles per-example weightings (VERDICT r1 item 5)."""
    from audio_mps_tpu.models.latent import recon_loss
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=4, hidden=16)
    data = _data()
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    from audio_mps_tpu.models.latent import decode_psi0
    psi0_pair = decode_psi0(params, z, CFG)

    r_ref = np.asarray(recon_loss(params, CFG, data, psi0_pair))
    r_fus = np.asarray(recon_loss(params, CFG, data, psi0_pair, fused=True))
    assert r_fus.shape == (4,)
    assert len(np.unique(r_fus)) > 1, "fused recon collapsed to a broadcast"
    np.testing.assert_allclose(r_fus, r_ref, rtol=1e-4, atol=1e-6)

    # arbitrary per-example weights differentiate identically through both
    w = jnp.asarray([0.1, 1.0, 2.0, 0.5])

    def weighted(p, fused):
        return jnp.sum(w * recon_loss(p, CFG, data, psi0_pair, fused=fused))

    g_ref = jax.grad(lambda p: weighted(p, False))(params)
    g_fus = jax.grad(lambda p: weighted(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_fused_recon_matches_xla():
    """Latent ELBO through the fused kernel == the XLA scan (value and
    gradients incl. the encoder/decoder MLPs via the per-example psi0
    cotangent)."""
    params = init_latent(jax.random.PRNGKey(0), CFG, latent_dim=4, hidden=16)
    data = _data()
    key = jax.random.PRNGKey(2)
    l_ref, _ = elbo_loss(params, CFG, data, key)
    l_fused, _ = elbo_loss(params, CFG, data, key, fused=True)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    g_ref = jax.grad(lambda p: elbo_loss(p, CFG, data, key)[0])(params)
    g_fus = jax.grad(lambda p: elbo_loss(p, CFG, data, key,
                                         fused=True)[0])(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_multi_pitch_batch_labels_and_pitch():
    """Two-pitch anchor dataset (tools/latent_check.py): labels index
    freqs_hz and the waveforms actually carry the labeled pitch (higher
    class has more zero crossings)."""
    from audio_mps_tpu.data.synthetic import multi_pitch_batch
    waves, labels = multi_pitch_batch(jax.random.PRNGKey(3), 16, 2048,
                                      CFG.delta_t, (261.6, 1046.4))
    assert waves.shape == (16, 2048) and labels.shape == (16,)
    labels = np.asarray(labels)
    assert set(np.unique(labels)) <= {0, 1}
    assert 0 in labels and 1 in labels  # both classes present at B=16
    w = np.asarray(waves)
    zc = (np.abs(np.diff(np.sign(w), axis=1)) > 1).sum(axis=1)
    assert zc[labels == 1].min() > zc[labels == 0].max()


def test_features_carry_pitch():
    """The encoder's framewise stats separate pitch: the zero-crossing
    block must be larger for a 4x higher frequency (amplitude stats alone
    cannot distinguish equal-amplitude sines — the latent quality anchor
    depends on this)."""
    from audio_mps_tpu.models.latent import N_FRAMES, N_STATS, _features
    k = jax.random.PRNGKey(4)
    low = damped_sine_batch(k, 2, 2048, CFG.delta_t, freq_hz=261.6)
    high = damped_sine_batch(k, 2, 2048, CFG.delta_t, freq_hz=1046.4)
    f_low, f_high = np.asarray(_features(low)), np.asarray(_features(high))
    assert f_low.shape == (2, N_FRAMES * N_STATS)
    zc_lo = f_low[:, 4 * N_FRAMES:].mean()
    zc_hi = f_high[:, 4 * N_FRAMES:].mean()
    assert zc_hi > 2.0 * zc_lo


@pytest.mark.parametrize("bond_dim", [4, 8])
def test_conditional_sampler_fused_matches_xla(bond_dim):
    """sample_latent_conditional (encode -> psi0 -> SDE): deterministic
    in (params, key, signals), finite, and the fused kernel path (split
    at D=4, block at D=8) reproduces the XLA scan exactly."""
    import dataclasses

    from audio_mps_tpu.models.latent import sample_latent_conditional
    cfg = dataclasses.replace(CFG, bond_dim=bond_dim)
    params = init_latent(jax.random.PRNGKey(0), cfg, latent_dim=4)
    sigs = _data()
    key = jax.random.PRNGKey(7)
    w = np.asarray(sample_latent_conditional(params, cfg, key, sigs, 96))
    assert w.shape == (4, 96) and np.isfinite(w).all()
    w2 = np.asarray(sample_latent_conditional(params, cfg, key, sigs, 96))
    np.testing.assert_array_equal(w, w2)
    w_fus = np.asarray(sample_latent_conditional(params, cfg, key, sigs,
                                                 96, fused=True))
    np.testing.assert_allclose(w_fus, w, rtol=2e-4, atol=1e-7)


def test_latent_separation_metrics():
    """The anchor's detectors (pure numpy): nearest-class-mean held-out
    accuracy and Fisher ratio on a cleanly separated synthetic posterior,
    and chance-level on an unseparated one."""
    import sys
    sys.path.insert(0, "tools")
    from latent_check import fisher_ratio, posterior_accuracy
    rng = np.random.default_rng(0)
    labels = np.arange(64) % 2
    mu = rng.normal(size=(64, 8)) * 0.1
    mu[labels == 1, 0] += 5.0
    assert posterior_accuracy(mu, labels) == 1.0
    assert fisher_ratio(mu, labels) > 100.0
    mu_bad = rng.normal(size=(64, 8))
    assert posterior_accuracy(mu_bad, labels) < 0.8
    assert fisher_ratio(mu_bad, labels) < 1.0
    # degenerate batches must stay finite (review r4): a single-example
    # class leaves one fit fold without that class — its eval examples
    # count as misses instead of NaN-poisoning the whole accuracy
    labels_one = np.zeros(9, int)
    labels_one[4] = 1
    mu_one = rng.normal(size=(9, 8)) * 0.1
    mu_one[4, 0] += 5.0
    acc = posterior_accuracy(mu_one, labels_one)
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0
    # non-(0,1) label values classify correctly too
    labels_lbl = np.where(labels == 1, 7, 3)
    assert posterior_accuracy(mu, labels_lbl) == 1.0


@pytest.mark.skipif(not os.environ.get("RUN_SLOW_PHYSICS"),
                    reason="slow latent quality run; set RUN_SLOW_PHYSICS=1 "
                           "on a TPU host (~13 min; results recorded in "
                           "PHYSICS_latent.json / BASELINE.md)")
def test_latent_learns_two_pitch_structure():
    """The validated full-scale recipe (D=16, T=2^16, B=16, beta=0.15,
    12000 steps): beta=1 measurably collapses the posterior (pitch is
    ~0.69 nats — exactly its KL cost) and T=2^14 never develops pitched
    emission, so the opt-in test runs the real thing. Validated result:
    posterior accuracy 1.0 (Fisher 268), conditional accuracy 1.0 with
    median pitch error 0.4 Hz, learned lines 261.587/392.006 Hz."""
    import sys
    sys.path.insert(0, "tools")
    import latent_check
    res, _ = latent_check.run(steps=12000, T=2 ** 16, bond_dim=16,
                              batch=16, beta=0.15, verbose=False)
    assert res["posterior_pass"], res
    assert res["conditional_pass"], res


def test_features_finite_at_single_sample_frames():
    """N_FRAMES <= T < 2*N_FRAMES gives one sample per frame — there are
    no within-frame pairs, and a mean over the empty diff axis NaN'd the
    whole ELBO (caught by dryrun_multichip(4): T = 4*16+1 = 65). The
    frame==1 path uses cross-frame differences of the decimated signal
    instead; T < N_FRAMES raises a clear contract error."""
    from audio_mps_tpu.models.latent import N_FRAMES, N_STATS, _features

    params = init_latent(jax.random.PRNGKey(0), CFG)
    for t in (N_FRAMES, N_FRAMES + 1, 2 * N_FRAMES - 1, 2 * N_FRAMES,
              2 * N_FRAMES + 1):
        sig = damped_sine_batch(jax.random.PRNGKey(2), 3, t, CFG.delta_t)
        f = _features(sig)
        assert f.shape == (3, N_FRAMES * N_STATS) and bool(
            jnp.isfinite(f).all()), t
        loss, aux = elbo_loss(params, CFG, sig,
                              eps=jnp.zeros((3, CFG.latent_dim)))
        assert bool(jnp.isfinite(loss)), (t, float(loss))
    with pytest.raises(ValueError, match="T >= "):
        _features(jnp.zeros((2, N_FRAMES - 1)))
