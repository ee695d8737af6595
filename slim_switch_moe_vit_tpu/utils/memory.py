"""Rehearsal memory for continual learning (reference: ``memory.py:5-58``).

Fixed-capacity store of past-task samples or dataset indices with random
subset insertion and random replacement when full. numpy host-side — replay
batches transfer to device with the regular input path.
"""
from __future__ import annotations

import typing as typ

import numpy as np


class RehearsalMemory:
    def __init__(self, max_size: int, input_shape: typ.Sequence[int],
                 output_shape: typ.Sequence[int], use_indices: bool = False,
                 seed: int = 0):
        self.size = 0
        self.max_size = max_size
        self.use_indices = use_indices
        self.rng = np.random.RandomState(seed)
        if use_indices:
            self._batch = np.empty((max_size,), dtype=np.int64)
            self._labels = np.empty((max_size,), dtype=np.int64)
        else:
            self._batch = np.empty((max_size, *input_shape), dtype=np.float32)
            self._labels = np.empty((max_size, *output_shape), dtype=np.float32)

    def __len__(self):
        return self.size

    def add(self, batch: np.ndarray, labels: np.ndarray, num_samples: int):
        """Randomly select num_samples from batch; random replacement when full
        (reference memory.py:25-49)."""
        assert num_samples <= batch.shape[0], \
            "number of samples to save more than batch size!"
        assert num_samples <= labels.shape[0], \
            "number of samples to save more than labels size!"
        assert batch.shape[0] == labels.shape[0], \
            "batch size does not match labels size!"

        idx = self.rng.permutation(batch.shape[0])[:num_samples]
        samples = batch[idx]
        sample_labels = labels[idx]

        if self.size + num_samples > self.max_size:
            free = self.max_size - self.size
            self._batch[self.size:self.size + free] = samples[:free]
            self._labels[self.size:self.size + free] = sample_labels[:free]
            samples = samples[free:]
            sample_labels = sample_labels[free:]
            n_repl = num_samples - free
            replaced = self.rng.permutation(self.max_size)[:n_repl]
            self._batch[replaced] = samples
            self._labels[replaced] = sample_labels
        else:
            self._batch[self.size:self.size + num_samples] = samples
            self._labels[self.size:self.size + num_samples] = sample_labels

        self.size = min(self.max_size, self.size + num_samples)

    @property
    def batch(self):
        return self._batch[: self.size]

    @property
    def labels(self):
        return self._labels[: self.size]
