"""Host-side prefetching batch iterator.

The reference does disk I/O (np.load per video) synchronously inside the
training hot loop with no prefetch (train.py:51 has a commented-out
remnant; data_handler.py:233). Here batch materialization runs in a
background thread with a bounded queue so feature reads and padding
overlap device compute, and bucketed shapes keep XLA recompiles bounded.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from mtn_tpu.config import DataConfig
from mtn_tpu.data.batching import BatchPlan, HostBatch, make_batch
from mtn_tpu.data.dataset import DialogueDataset

_SENTINEL = object()


class BatchIterator:
    """Iterate HostBatches for a list of plans, prefetching in background."""

    def __init__(self, data: DialogueDataset, plans: Sequence[BatchPlan],
                 cfg: DataConfig, train: bool,
                 rng: Optional[np.random.Generator] = None,
                 prefetch: Optional[int] = None,
                 transform=None,
                 seed_key: Optional[Sequence[int]] = None,
                 start: int = 0, feature_cache=None):
        self.data = data
        self.plans = list(plans)
        self.cfg = cfg
        self.train = train
        self.rng = rng or np.random.default_rng(0)
        self.prefetch = cfg.prefetch if prefetch is None else prefetch
        # write-once transfer-dtype block cache (feature_cache.py):
        # epoch 1 fills it, later epochs serve feature blocks from mmap
        self.feature_cache = feature_cache
        # applied in the producer thread — e.g. device_batch, so the
        # host->device transfer overlaps the previous step's compute
        self.transform = transform
        # Keyed per-batch randomness: batch i draws from
        # default_rng([*seed_key, start + i]) instead of a shared
        # sequential stream. This makes the stochastic augmentation
        # (cut_a) a pure function of (seed, epoch, absolute batch index),
        # so a mid-epoch resume that skips the first `start` batches
        # reproduces the exact draws of an uninterrupted run.
        self.seed_key = tuple(seed_key) if seed_key is not None else None
        self.start = start

    def _make(self, plan: BatchPlan, idx: int) -> HostBatch:
        cfg = self.cfg
        rng = (np.random.default_rng((*self.seed_key, self.start + idx))
               if self.seed_key is not None else self.rng)
        hb = make_batch(
            self.data, plan, separate_caption=cfg.separate_caption,
            skip=cfg.skip, cut_a=(cfg.cut_a and self.train),
            cut_a_p=cfg.cut_a_p, rng=rng,
            length_bucket=cfg.length_bucket, feature_bucket=cfg.feature_bucket,
            pad_rows_to=(cfg.batch_size if cfg.pad_batch_to_full else 0),
            use_native_loader=cfg.use_native_loader,
            feature_cache=self.feature_cache)
        return self.transform(hb) if self.transform is not None else hb

    def __len__(self) -> int:
        return len(self.plans)

    def __iter__(self) -> Iterator[HostBatch]:
        if self.prefetch <= 0:
            for i, plan in enumerate(self.plans):
                yield self._make(plan, i)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        err: List[BaseException] = []

        def producer():
            try:
                for i, plan in enumerate(self.plans):
                    q.put(self._make(plan, i))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]


def shuffled(plans: Sequence[BatchPlan],
             rng: np.random.Generator) -> List[BatchPlan]:
    """Epoch shuffle of the batch plan (parity: train.py:194)."""
    order = rng.permutation(len(plans))
    return [plans[i] for i in order]
