"""TensorBoard observability — all four modalities of the reference
(reference: train.py:62-85, utils.py:10-17): scalars, histograms, audio of
training batches, and matplotlib waveform images of data and fresh samples.

Backed by ``torch.utils.tensorboard`` (CPU torch + tensorboard are part of
the baked environment); imports are gated so the core library and tests do
not depend on them.
"""
from __future__ import annotations

import numpy as np


def make_writer(logdir: str):
    """Create a SummaryWriter, or None if tensorboard is unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        return None
    return SummaryWriter(log_dir=logdir)


def waveform_figure(waveform: np.ndarray, delta_t: float):
    """Matplotlib waveform plot (reference: utils.py:10-17)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(3, 3))
    times = np.arange(len(waveform)) * delta_t
    ax.plot(times, waveform)
    ax.set_ylabel("signal")
    ax.set_xlabel("time")
    fig.tight_layout()
    return fig


def write_step_summaries(writer, step: int, metrics: dict, cfg, run,
                         params=None, data=None, samples=None):
    """Emit the reference summary set (reference: train.py:62-85).

    metrics: dict of scalar floats (model_loss, total_loss, h_l2sqnorm,
    r_l2sqnorm, A, ...). data/samples: [N, T] numpy waveforms (optional).
    """
    if writer is None:
        return
    h_sq = float(metrics.get("h_l2sqnorm", 0.0))
    r_sq = float(metrics.get("r_l2sqnorm", 0.0))
    writer.add_scalar("A", float(metrics.get("A", cfg.A)), step)
    writer.add_scalar("sigma", cfg.sigma, step)
    writer.add_scalar("h_l2norm", np.sqrt(max(h_sq, 0.0)), step)
    writer.add_scalar("r_l2norm", np.sqrt(max(r_sq, 0.0)), step)
    # Physics health metric (reference: train.py:68-69).
    gr_rate = 2 * np.pi * cfg.sigma ** 2 * r_sq / cfg.bond_dim
    if gr_rate > 0:
        writer.add_scalar("gr_decay_time", 1.0 / gr_rate, step)
    writer.add_scalar("model_loss", float(metrics["model_loss"]), step)
    writer.add_scalar("total_loss", float(metrics["total_loss"]), step)
    # latent-variant extras (ELBO decomposition)
    for k in ("recon", "kl"):
        if k in metrics:
            writer.add_scalar(k, float(metrics[k]), step)

    if params is not None:
        freqs = np.asarray(params.freqs)
        writer.add_histogram("frequencies", freqs / (2 * np.pi), step)

    if data is not None:
        data = np.asarray(data)
        # Audio summaries of training batches (reference: train.py:74).
        for i in range(min(5, data.shape[0])):
            clip = data[i] / (np.abs(data[i]).max() + 1e-9)
            writer.add_audio(f"data/{i}", clip[None, :], step,
                             sample_rate=run.sample_rate)
        if run.visualize:
            fig = waveform_figure(data[0], cfg.delta_t)
            writer.add_figure("data_waveform", fig, step)

    if samples is not None and run.visualize:
        samples = np.asarray(samples)
        fig = waveform_figure(samples[0], cfg.delta_t)
        writer.add_figure("sample_waveform", fig, step)
        for i in range(min(3, samples.shape[0])):
            clip = samples[i] / (np.abs(samples[i]).max() + 1e-9)
            writer.add_audio(f"samples/{i}", clip[None, :], step,
                             sample_rate=run.sample_rate)
