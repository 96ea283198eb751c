"""Two-stream batch sampling for semi-supervised training.

Reproduces the exact semantics of the reference `TwoStreamBatchSampler`
(`code/dataloaders/dataset.py:205-253`, duplicated `brats2019.py:191-237`):

  * An "epoch" is one pass over a fresh permutation of the *labeled*
    (primary) indices, chunked into groups of `primary_batch_size`
    (remainder dropped).
  * The *unlabeled* (secondary) stream is an eternal chain of fresh
    permutations, consumed `secondary_batch_size` at a time, carrying
    over across epochs.
  * Batch layout is ``[labeled..., unlabeled...]`` — trainers slice
    ``batch[:labeled_bs]`` / ``batch[labeled_bs:]``
    (train_inherent_consistent_unet_2D.py:117).
  * Epoch length = len(labeled) // primary_batch_size.

Randomness comes from a numpy Generator owned by the sampler (the
reference uses global np.random inside forked workers with inherited
seeds — loose by design; we make it explicit and reproducible).
"""
from __future__ import annotations

import itertools
from typing import Iterator, Sequence

import numpy as np


def _grouper(iterable, n):
    "Collect data into fixed-length chunks, dropping the remainder."
    args = [iter(iterable)] * n
    return zip(*args)


class TwoStreamBatchSampler:
    def __init__(
        self,
        primary_indices: Sequence[int],
        secondary_indices: Sequence[int],
        batch_size: int,
        secondary_batch_size: int,
        seed: int | None = None,
    ):
        self.primary_indices = list(primary_indices)
        self.secondary_indices = list(secondary_indices)
        self.secondary_batch_size = secondary_batch_size
        self.primary_batch_size = batch_size - secondary_batch_size
        assert len(self.primary_indices) >= self.primary_batch_size > 0
        assert len(self.secondary_indices) >= self.secondary_batch_size > 0
        self._rng = np.random.default_rng(seed)
        # The secondary stream persists across epochs (iterate_eternally).
        self._secondary_iter = self._iterate_eternally(self.secondary_indices)

    def _iterate_eternally(self, indices) -> Iterator[int]:
        def infinite_shuffles():
            while True:
                yield self._rng.permutation(indices)

        return itertools.chain.from_iterable(infinite_shuffles())

    def __iter__(self) -> Iterator[list[int]]:
        primary_iter = iter(self._rng.permutation(self.primary_indices))
        return (
            list(primary_batch) + list(secondary_batch)
            for (primary_batch, secondary_batch) in zip(
                _grouper(primary_iter, self.primary_batch_size),
                _grouper(self._secondary_iter, self.secondary_batch_size),
            )
        )

    def __len__(self) -> int:
        return len(self.primary_indices) // self.primary_batch_size


def two_stream_batches(
    primary_indices: Sequence[int],
    secondary_indices: Sequence[int],
    batch_size: int,
    secondary_batch_size: int,
    seed: int | None = None,
) -> Iterator[list[int]]:
    """Endless stream of two-stream batches (epochs chained), the shape of
    the reference's epoch-loop-over-sampler (train_…unet_2D.py:111-112)."""
    sampler = TwoStreamBatchSampler(
        primary_indices, secondary_indices, batch_size, secondary_batch_size, seed
    )
    while True:
        yield from sampler
