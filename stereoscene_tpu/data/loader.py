"""Batched, prefetching host loader.

Replaces the reference's torch DataLoader + DistributedGroupSampler stack
(ref: datasets/builder.py:19-94, datasets/samplers/) with a thread-pool
pipeline + double-buffered device prefetch:

- index sharding across hosts via ``SemanticKittiIndex.shard`` (the
  DistributedSampler equivalent; seed-offset shuffling per epoch matches the
  reference's ``worker_init_fn`` intent, builder.py:96),
- worker threads run the numpy pipeline,
- batches are stacked and (optionally) ``jax.device_put`` with sharding while
  the model is busy, hiding host latency behind device compute.
"""

from __future__ import annotations

import inspect
import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np


def _accepts_seed(pipeline: Callable) -> bool:
    try:
        sig = inspect.signature(
            pipeline.__call__ if not inspect.isfunction(pipeline) else pipeline
        )
    except (TypeError, ValueError):
        return False
    return "seed" in sig.parameters


class BatchLoader:
    def __init__(
        self,
        frames: List,
        pipeline: Callable,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
        device_put: Optional[Callable] = None,
    ):
        self.frames = frames
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.device_put = device_put
        self.epoch = 0
        # Deterministic per-sample augmentation seeds: pipelines whose
        # __call__ accepts ``seed`` get one derived from (loader seed, epoch,
        # sample index), making augmentation draws reproducible and
        # independent of worker-thread scheduling.
        self._pipeline_takes_seed = _accepts_seed(pipeline)

    def __len__(self):
        n = len(self.frames)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.frames))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        return order

    def __iter__(self) -> Iterator:
        order = self._epoch_order()
        epoch = self.epoch
        self.epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for i, b in enumerate(batches):
            idx_q.put((i, b))

        results = {}
        results_lock = threading.Lock()
        next_emit = [0]

        def worker():
            while True:
                try:
                    i, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                if self._pipeline_takes_seed:
                    samples = [
                        self.pipeline(
                            self.frames[j],
                            seed=(
                                self.seed * 1000003 + epoch * 131071 + int(j)
                            ) % (2**31 - 1),
                        )
                        for j in idxs
                    ]
                else:
                    samples = [self.pipeline(self.frames[j]) for j in idxs]
                keys = samples[0].keys()
                batch = {k: np.stack([s[k] for s in samples]) for k in keys}
                with results_lock:
                    results[i] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for _ in range(len(batches)):
            batch = out_q.get()
            if self.device_put is not None:
                batch = self.device_put(batch)
            yield batch
