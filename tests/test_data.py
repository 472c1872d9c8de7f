"""Data pipeline tests (reference: tests/test_data.py)."""
import jax
import numpy as np
import pytest

from audio_mps_tpu import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch, damped_sine_iterator

HP = CMPSConfig()


@pytest.mark.smoke
def test_damped_sine_shape():
    # reference tests/test_data.py:12-16
    batch = damped_sine_batch(jax.random.PRNGKey(0), HP.minibatch_size,
                              2 ** 10, HP.delta_t)
    assert batch.shape == (HP.minibatch_size, 2 ** 10)
    assert np.isfinite(np.asarray(batch)).all()


def test_damped_sine_silent_before_onset():
    """Gate is closed before the random delay (reference data.py:19)."""
    batch = np.asarray(damped_sine_batch(jax.random.PRNGKey(0), 4, 2 ** 10,
                                         HP.delta_t))
    assert np.abs(batch[:, 0]).max() == 0.0


def test_damped_sine_amplitude_bounded():
    batch = np.asarray(damped_sine_batch(jax.random.PRNGKey(0), 8, 2 ** 12,
                                         HP.delta_t))
    assert np.abs(batch).max() <= 1.0 + 1e-6


def test_iterator_yields_fresh_batches():
    it = damped_sine_iterator(HP, 256, seed=0)
    b1, b2 = next(it), next(it)
    assert b1.shape == b2.shape == (HP.minibatch_size, 256)
    assert not np.allclose(np.asarray(b1), np.asarray(b2))


def test_config_parse_overrides():
    cfg = HP.parse("bond_dim=32,learning_rate=0.01,initial_rank=4")
    assert cfg.bond_dim == 32
    assert cfg.learning_rate == 0.01
    assert cfg.initial_rank == 4
    assert cfg.minibatch_size == HP.minibatch_size


def test_run_config_fused_validated_at_construction():
    from audio_mps_tpu.config import RunConfig, parse_argv
    with pytest.raises(ValueError, match="fused"):
        RunConfig(fused="yes")
    with pytest.raises(ValueError, match="fused"):
        parse_argv(["--fused=maybe"])
    assert parse_argv(["--fused=true"]).fused == "true"


def test_get_audio_damped_sine_dispatcher():
    from audio_mps_tpu.data import get_audio
    it = get_audio("/nonexistent", "damped_sine", HP, sample_duration=256)
    b = next(it)
    assert b.shape == (HP.minibatch_size, 256)
