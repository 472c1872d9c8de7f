"""Estimator-style chunked trainer tests (reference:
training_estimators.py — the legacy path, here working)."""
import numpy as np

import pytest
from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.estimator import (Estimator, EstimatorConfig,
                                     build_input_fn, parse_args)
from audio_mps_tpu.utils import symmetrize
import jax.numpy as jnp


@pytest.mark.smoke
def test_parse_args():
    ec = parse_args(["--bond_d=6", "--discr=true", "--viz_steps=3",
                     "--dt=0.001"])
    assert ec.bond_d == 6 and ec.discr and ec.viz_steps == 3
    assert ec.dt == 0.001


def test_estimator_train_eval_resume(tmp_path):
    cfg = CMPSConfig(minibatch_size=2, bond_dim=3, scan_chunk=32)
    ec = EstimatorConfig(sample_duration=128, batch_size=2)
    input_fn = build_input_fn(ec, cfg)

    est = Estimator("psi_mps", cfg, str(tmp_path), save_checkpoints_steps=2)
    m = est.train(input_fn, steps=4)
    assert est.global_step == 4
    assert np.isfinite(m["model_loss"])
    ev = est.evaluate(input_fn, steps=2)
    assert np.isfinite(ev["loss"])
    est.close()

    # a fresh Estimator on the same model_dir resumes at step 4
    est2 = Estimator("psi_mps", cfg, str(tmp_path), save_checkpoints_steps=2)
    assert est2.global_step == 4
    est2.train(input_fn, steps=2)
    assert est2.global_step == 6
    est2.close()


def test_symmetrize():
    M = jnp.asarray(np.arange(9.0).reshape(3, 3))
    S = np.asarray(symmetrize(M))
    np.testing.assert_allclose(S, S.T)
    np.testing.assert_allclose(np.diag(S), np.diag(M))
    np.testing.assert_allclose(np.tril(S), np.tril(M))


def test_estimator_latent_train_eval_resume(tmp_path):
    """The latent (ELBO) family rides the chunked estimator driver too:
    the key stream derives from the global step, so resumed training
    replays the identical reparameterization noise."""
    cfg = CMPSConfig(minibatch_size=2, bond_dim=4, scan_chunk=32,
                     latent_dim=4, latent_hidden=8)
    ec = EstimatorConfig(sample_duration=128, batch_size=2)
    input_fn = build_input_fn(ec, cfg)

    est = Estimator("latent", cfg, str(tmp_path), save_checkpoints_steps=2)
    m = est.train(input_fn, steps=4)
    assert est.global_step == 4
    assert np.isfinite(m["model_loss"]) and np.isfinite(m["kl"])
    ev = est.evaluate(input_fn, steps=2)
    assert np.isfinite(ev["loss"])
    est.close()

    est2 = Estimator("latent", cfg, str(tmp_path), save_checkpoints_steps=2)
    assert est2.global_step == 4          # resumed from the checkpoint
    m2 = est2.train(input_fn, steps=2)
    assert est2.global_step == 6
    assert np.isfinite(m2["model_loss"])
    est2.close()
