"""In-memory batching pipeline.

The reference's training input is ``batch -> shuffle(24) -> repeat`` over a
TFRecord dataset (reference: data.py:37-43) — note it shuffles *whole
batches* with a tiny buffer (a quirk). Here the dataset (≤ a few hundred
waveforms in the reference's own ETL, make-small-dataset.py:19) lives in
host memory as one [N, T] array; we shuffle *examples* each epoch and batch
after, which strictly dominates the reference's mixing.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


class ArrayDataset:
    """Shuffle-repeat-batch over an in-memory [N, T] array."""

    def __init__(self, data: np.ndarray, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_remainder: bool = True):
        data = np.asarray(data, dtype=np.float32)
        if data.ndim != 2:
            raise ValueError(f"expected [N, T] data, got {data.shape}")
        if data.shape[0] < batch_size and drop_remainder:
            # Small datasets still need full batches: tile up (the reference
            # would loop the repeat() anyway).
            reps = -(-batch_size // data.shape[0])
            data = np.tile(data, (reps, 1))
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = self.data.shape[0]
        b = self.batch_size
        while True:
            order = (self._rng.permutation(n) if self.shuffle
                     else np.arange(n))
            stop = (n // b) * b if self.drop_remainder else n
            for i in range(0, stop, b):
                yield self.data[order[i:i + b]]
