"""Host-side data loading with background prefetch to device.

Replaces the reference's torch DataLoader workers (train stack, 4 workers,
SURVEY.md §3.1): a thread pool maps dataset indices to samples, a
background thread collates and stages the next batches so the TPU never
waits on JPEG decode / tokenization.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        collate: Callable,
        batch_size: int,
        num_steps: int,
        num_workers: int = 8,
        prefetch: int = 2,
        sharding=None,
        drop_keys=("prompt",),
        seed: int = 0,
    ):
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size
        self.num_steps = num_steps
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self.drop_keys = drop_keys
        self.seed = seed

    def _produce(self, q: "queue.Queue"):
        rng = np.random.default_rng(self.seed)
        with ThreadPoolExecutor(self.num_workers) as pool:
            for _ in range(self.num_steps):
                idxs = rng.integers(0, len(self.dataset), size=self.batch_size)
                samples = list(pool.map(lambda i: self.dataset[int(i)], idxs))
                batch = self.collate(samples)
                batch = {k: v for k, v in batch.items() if k not in self.drop_keys}
                if self.sharding is not None:
                    batch = {
                        k: jax.device_put(v, self.sharding) for k, v in batch.items()
                    }
                q.put(batch)
        q.put(None)

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
