"""``get_audio`` — the data entry point (reference: data.py:6-45).

Dispatches between the synthetic damped-sine generator and TFRecord-backed
datasets (``{datadir}/{dataset}.tfrecords`` with audio-only Examples, e.g.
guitar/organ). Returns an infinite iterator of [B, T] float32 batches.

Large files stream: above ``stream_threshold_bytes`` (or with
``stream=True``) batches come from a reservoir-shuffled record stream
(data/pipeline.py:iter_audio_tfrecords) instead of loading the whole [N, T]
array into host RAM — full NSynth (the reference reader.py use case) is
~70 GB, far beyond what the reference's eager path could hold.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

from ..config import CMPSConfig
from .pipeline import ArrayDataset, iter_audio_tfrecords
from .synthetic import damped_sine_iterator
from .tfrecord import read_audio_tfrecords

# Files larger than this stream through the reservoir shuffle instead of
# being materialized in host memory (the reference's own small datasets
# are ~100 waveforms, make-small-dataset.py:19 — far below this).
DEFAULT_STREAM_THRESHOLD = 256 << 20  # 256 MB


def get_audio(datadir: str, dataset: str, hps: CMPSConfig,
              sample_duration: int = 2 ** 16, seed: int = 0,
              stream: Optional[bool] = None,
              stream_threshold_bytes: int = DEFAULT_STREAM_THRESHOLD
              ) -> Iterator:
    """Infinite iterator of [minibatch_size, sample_duration] batches
    (reference: data.py:6-45, same dataset names as train.py:23-25).

    ``stream=None`` auto-selects: in-memory shuffle-repeat-batch for small
    files, streaming reservoir shuffle above `stream_threshold_bytes`.
    """
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
    if stream is None:
        stream = os.path.getsize(path) > stream_threshold_bytes
    if stream:
        return iter_audio_tfrecords(path, hps.minibatch_size,
                                    sample_duration=sample_duration,
                                    seed=seed)
    data = read_audio_tfrecords(path, sample_duration=sample_duration)
    return iter(ArrayDataset(data, hps.minibatch_size, seed=seed))
