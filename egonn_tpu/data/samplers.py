"""Batch sampler: groups of k=2 positives with dynamic batch expansion.

Parity with reference datasets/samplers.py (jac99/Egonn), minus the torch Sampler
base class. The trainer calls expand_batch() when the non-zero-triplet ratio drops
below batch_expansion_th (reference training/trainer.py:269-278).

TPU note: the actual compiled batch shape is bucketed by the input pipeline
(data/pipeline.py); the sampler only decides WHICH elements form a batch.
"""
from __future__ import annotations

import copy
import random
from typing import List, Optional


class ListDict:
    """O(1) add/remove/choose_random over a set (reference :12-44)."""

    def __init__(self, items=None):
        if items is not None:
            self.items = copy.deepcopy(list(items))
            self.item_to_position = {item: ndx for ndx, item in enumerate(self.items)}
        else:
            self.items = []
            self.item_to_position = {}

    def add(self, item):
        if item in self.item_to_position:
            return
        self.items.append(item)
        self.item_to_position[item] = len(self.items) - 1

    def remove(self, item):
        position = self.item_to_position.pop(item)
        last_item = self.items.pop()
        if position != len(self.items):
            self.items[position] = last_item
            self.item_to_position[last_item] = position

    def choose_random(self):
        return random.choice(self.items)

    def __contains__(self, item):
        return item in self.item_to_position

    def __iter__(self):
        return iter(self.items)

    def __len__(self):
        return len(self.items)


class BatchSampler:
    """Yields lists of element ids; each batch is pairs (anchor, positive)."""

    def __init__(self, dataset, batch_size: int, batch_size_limit: Optional[int] = None,
                 batch_expansion_rate: Optional[float] = None,
                 max_batches: Optional[int] = None, seed: Optional[int] = None):
        if batch_expansion_rate is not None:
            assert batch_expansion_rate > 1.0
            assert batch_size <= batch_size_limit
        self.batch_size = batch_size
        self.batch_size_limit = batch_size_limit
        self.batch_expansion_rate = batch_expansion_rate
        self.max_batches = max_batches
        self.dataset = dataset
        self.k = 2
        if self.batch_size < 2 * self.k:
            self.batch_size = 2 * self.k
        self.batch_idx: List[List[int]] = []
        self.elems_ndx = list(dataset.queries)
        self._seed = seed
        self._rng = random.Random(seed) if seed is not None else random

    def set_epoch(self, epoch: int):
        """Reseed the batch-generation RNG deterministically per epoch (no-op
        when the sampler is unseeded).  Epoch E's batches then depend only on
        (seed, epoch, batch_size) — the property checkpoint resume relies on:
        a run resumed at an epoch boundary regenerates the identical batch
        sequence the uninterrupted run would have produced."""
        if self._seed is not None:
            self._rng = random.Random(f"{self._seed}:{epoch}")

    def __iter__(self):
        self.generate_batches()
        yield from self.batch_idx

    def __len__(self):
        return len(self.batch_idx)

    def expand_batch(self):
        if self.batch_expansion_rate is None:
            print("WARNING: batch_expansion_rate is None")
            return
        if self.batch_size >= self.batch_size_limit:
            return
        old = self.batch_size
        self.batch_size = min(
            int(self.batch_size * self.batch_expansion_rate), self.batch_size_limit
        )
        print(f"=> Batch size increased from: {old} to {self.batch_size}")

    def generate_batches(self):
        self.batch_idx = []
        unused = ListDict(self.elems_ndx)
        current_batch: List[int] = []
        while True:
            if len(current_batch) >= self.batch_size or len(unused) == 0:
                if len(current_batch) >= 2 * self.k:
                    assert len(current_batch) % self.k == 0
                    self.batch_idx.append(current_batch)
                    current_batch = []
                    if self.max_batches is not None and len(self.batch_idx) >= self.max_batches:
                        break
                if len(unused) == 0:
                    break
            selected = self._choose(unused)
            unused.remove(selected)
            positives = self.dataset.get_positives(selected)
            if len(positives) == 0:
                continue
            unused_positives = [e for e in positives if e in unused]
            if unused_positives:
                second = self._choice(unused_positives)
                unused.remove(second)
            else:
                second = self._choice(list(positives))
            current_batch += [selected, second]

    def _choose(self, listdict: ListDict):
        return self._rng.choice(listdict.items)

    def _choice(self, seq):
        return self._rng.choice(seq)
