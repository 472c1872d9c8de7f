"""Observability tests: the four TensorBoard summary modalities of the
reference (reference: train.py:62-85 — scalars incl. the derived
gr_decay_time, the learned-frequencies histogram, audio of training
batches, and matplotlib waveform figures of data and fresh samples) are
actually WRITTEN by a real training run and read back from the event file
(VERDICT r2 item 4: this subsystem previously had zero automated
coverage)."""
import glob
import math
import os

import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig, RunConfig
from audio_mps_tpu.summaries import make_writer, waveform_figure, \
    write_step_summaries


def _load_accumulator(logdir):
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(logdir, size_guidance={
        "scalars": 0, "histograms": 0, "audio": 0, "images": 0})
    acc.Reload()
    return acc


@pytest.fixture(scope="module")
def train_run(tmp_path_factory):
    """One tiny end-to-end train run with visualize=True and sampling on
    (the configuration every other CLI test turns OFF)."""
    from audio_mps_tpu.train import train

    logdir = str(tmp_path_factory.mktemp("tb"))
    run = RunConfig(mps_model="psi_mps", dataset="damped_sine",
                    sample_duration=96, max_steps=2, summary_every=1,
                    visualize=True, num_samples=1, logdir=logdir,
                    hparams="bond_dim=4,minibatch_size=2,scan_chunk=32")
    cfg = CMPSConfig().parse(run.hparams)
    params, metrics = train(run, verbose=False)
    return run, cfg, params, metrics, run.run_logdir(cfg)


def test_event_file_written(train_run):
    _, _, _, _, logdir = train_run
    assert glob.glob(os.path.join(logdir, "events.out.tfevents.*"))


def test_all_four_modalities_present(train_run):
    """Scalars + histogram + audio + figure-images — the full reference
    summary surface (reference: train.py:62-85)."""
    _, _, _, _, logdir = train_run
    acc = _load_accumulator(logdir)
    tags = acc.Tags()
    for scalar in ("A", "sigma", "h_l2norm", "r_l2norm", "gr_decay_time",
                   "model_loss", "total_loss"):
        assert scalar in tags["scalars"], (scalar, tags["scalars"])
    assert "frequencies" in tags["histograms"]
    assert "data/0" in tags["audio"]
    # torch's add_figure lands as an image summary
    assert any(t.startswith("sample_waveform") for t in tags["images"]), \
        tags["images"]
    assert any(t.startswith("data_waveform") for t in tags["images"])


def test_scalar_values_match_metrics(train_run):
    _, cfg, _, metrics, logdir = train_run
    acc = _load_accumulator(logdir)
    losses = {e.step: e.value for e in acc.Scalars("model_loss")}
    assert len(losses) >= 2
    np.testing.assert_allclose(losses[max(losses)],
                               float(metrics["model_loss"]), rtol=1e-5)
    sigmas = [e.value for e in acc.Scalars("sigma")]
    np.testing.assert_allclose(sigmas, cfg.sigma, rtol=1e-6)


def test_gr_decay_time_formula(train_run):
    """gr_decay_time == 1 / (2 pi sigma^2 ||R||^2 / D) — the physics
    health metric (reference: train.py:68-69)."""
    _, cfg, _, metrics, logdir = train_run
    acc = _load_accumulator(logdir)
    events = acc.Scalars("gr_decay_time")
    last = events[-1].value
    expected = 1.0 / (2 * math.pi * cfg.sigma ** 2
                      * float(metrics["r_l2sqnorm"]) / cfg.bond_dim)
    np.testing.assert_allclose(last, expected, rtol=1e-4)


def test_frequencies_histogram_in_hz(train_run):
    """The histogram plots freqs / (2 pi) — Hz, like the reference
    (reference: train.py:75)."""
    _, _, params, _, logdir = train_run
    acc = _load_accumulator(logdir)
    hist = acc.Histograms("frequencies")[-1].histogram_value
    f_hz = np.asarray(params.freqs) / (2 * np.pi)
    np.testing.assert_allclose(hist.min, f_hz.min(), rtol=1e-5)
    np.testing.assert_allclose(hist.max, f_hz.max(), rtol=1e-5)


def test_latent_metrics_written(tmp_path):
    """The latent family's ELBO decomposition (recon/kl) reaches the
    event file."""
    writer = make_writer(str(tmp_path))
    assert writer is not None
    cfg = CMPSConfig(bond_dim=4)
    run = RunConfig(visualize=False)
    write_step_summaries(writer, 1, {"model_loss": 3.0, "total_loss": 3.5,
                                     "recon": 2.0, "kl": 1.0,
                                     "h_l2sqnorm": 0.1, "r_l2sqnorm": 0.2,
                                     "A": 100.0}, cfg, run)
    writer.close()
    acc = _load_accumulator(str(tmp_path))
    tags = acc.Tags()["scalars"]
    assert "recon" in tags and "kl" in tags


@pytest.mark.smoke
def test_waveform_figure():
    fig = waveform_figure(np.sin(np.linspace(0, 6, 64)), 1 / 16000)
    ax = fig.axes[0]
    assert ax.get_xlabel() == "time" and ax.get_ylabel() == "signal"
    line = ax.lines[0]
    assert len(line.get_ydata()) == 64
