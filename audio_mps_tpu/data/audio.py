"""``get_audio`` — the data entry point (reference: data.py:6-45).

Dispatches between the synthetic damped-sine generator and TFRecord-backed
datasets (``{datadir}/{dataset}.tfrecords`` with audio-only Examples, e.g.
guitar/organ). Returns an infinite iterator of [B, T] float32 batches.
"""
from __future__ import annotations

import os
from typing import Iterator

from ..config import CMPSConfig
from .pipeline import ArrayDataset
from .synthetic import damped_sine_iterator
from .tfrecord import read_audio_tfrecords


def get_audio(datadir: str, dataset: str, hps: CMPSConfig,
              sample_duration: int = 2 ** 16, seed: int = 0) -> Iterator:
    """Infinite iterator of [minibatch_size, sample_duration] batches
    (reference: data.py:6-45, same dataset names as train.py:23-25)."""
    if dataset == "damped_sine":
        return damped_sine_iterator(hps, sample_duration, seed=seed)
    path = os.path.join(datadir, f"{dataset}.tfrecords")
    if not os.path.exists(path):
        alt = os.path.join(datadir, f"{dataset}.tfrecord")
        if os.path.exists(alt):
            path = alt
        else:
            raise FileNotFoundError(
                f"dataset file {path} not found; create it with "
                f"tools/make_small_dataset.py (reference: "
                f"make-small-dataset.py)")
    data = read_audio_tfrecords(path, sample_duration=sample_duration)
    return iter(ArrayDataset(data, hps.minibatch_size, seed=seed))
