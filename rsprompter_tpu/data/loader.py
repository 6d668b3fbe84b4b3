"""Minimal dataloader: shuffling sampler + padded-batch collation.

Replaces the reference's torch DataLoader + DefaultSampler
(``configs/rsprompter/_base_/rsprompter_anchor.py`` train_dataloader). The
host pipeline stays numpy; batches land on device via the jitted step's
sharding. For multi-host DP, ``shard_id``/``num_shards`` split the index
space like mmengine's DistSampler.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from rsprompter_tpu.data.transforms import collate_batch


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 2,
        shuffle: bool = True,
        seed: int = 0,
        max_gt: int = 100,
        pad_shape: Optional[Tuple[int, int]] = None,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
        prefetch: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.max_gt = max_gt
        self.pad_shape = pad_shape
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        if self.prefetch > 0:
            return self._iter_prefetch()
        return self._iter_sync()

    def _iter_prefetch(self) -> Iterator:
        """Decode/transform batches in a background thread (the num_workers
        analogue of the reference's torch DataLoader)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for item in self._iter_sync():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    def _iter_sync(self) -> Iterator:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(indices)
        indices = indices[self.shard_id :: self.num_shards]
        self.epoch += 1
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            samples = [self.dataset[int(i)] for i in chunk]
            yield collate_batch(
                samples,
                batch_size=self.batch_size,
                max_gt=self.max_gt,
                pad_shape=self.pad_shape,
            )
