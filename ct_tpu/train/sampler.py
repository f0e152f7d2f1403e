"""Infinite shuffled index stream for iteration-based training.

Capability parity with ``TrainingSampler`` (/root/reference/utils/
sampler.py:8-46): an endless stream of dataset indices, reshuffled each
epoch from a seeded generator, plus the episodic batch sampler the
reference ships but never uses (:49-64) for API completeness.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


class TrainingSampler:
    def __init__(self, size: int, shuffle: bool = True,
                 seed: Optional[int] = None):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._rng = np.random.default_rng(
            seed if seed is not None else np.random.SeedSequence().entropy
        )

    def __iter__(self) -> Iterator[int]:
        while True:
            if self._shuffle:
                order = self._rng.permutation(self._size)
            else:
                order = np.arange(self._size)
            yield from order.tolist()


class EpisodicBatchSampler:
    """n_episodes batches of n_way class indices (few-shot episodes)."""

    def __init__(self, n_classes: int, n_way: int, n_episodes: int,
                 seed: Optional[int] = None):
        self.n_classes = n_classes
        self.n_way = n_way
        self.n_episodes = n_episodes
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.n_episodes

    def __iter__(self):
        for _ in range(self.n_episodes):
            yield self._rng.permutation(self.n_classes)[: self.n_way].tolist()


def batch_iterator(sampler: TrainingSampler, batch_size: int):
    """Group an infinite index stream into fixed-size batches."""
    it = iter(sampler)
    while True:
        yield [next(it) for _ in range(batch_size)]
