"""Host-side data loading with background prefetch to device.

Replaces the reference's torch DataLoader workers (train stack, 4 workers,
SURVEY.md §3.1): a thread pool maps dataset indices to samples, a
background thread collates and stages the next batches so the TPU never
waits on JPEG decode / tokenization.

Multi-host (pod) semantics: every process draws the SAME global index
stream (common seed), keeps only its `process_index`-th slice, and
assembles the globally-sharded batch with
`jax.make_array_from_process_local_data` — each host feeds just its own
devices, the DeepSpeed-launcher equivalent of per-rank samplers.
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
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size  # GLOBAL batch size
        self.num_steps = num_steps
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self.drop_keys = drop_keys
        self.seed = seed
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{self.process_count} processes"
            )

    def local_indices(self, rng: np.random.Generator) -> np.ndarray:
        """Draw the global index vector (identical on every host — same
        seed) and keep this host's interleaved slice."""
        idxs = rng.integers(0, len(self.dataset), size=self.batch_size)
        return idxs[self.process_index :: self.process_count]

    def _stage(self, batch: Dict[str, np.ndarray]) -> Dict:
        if self.sharding is None:
            return batch
        if self.process_count == 1:
            return {k: jax.device_put(v, self.sharding) for k, v in batch.items()}
        # local shard -> global sharded jax.Array (hosts feed their devices)
        def to_global(v):
            global_shape = (self.batch_size,) + v.shape[1:]
            return jax.make_array_from_process_local_data(
                self.sharding, v, global_shape
            )

        return {k: to_global(v) for k, v in batch.items()}

    def _produce(self, q: "queue.Queue"):
        try:
            rng = np.random.default_rng(self.seed)
            with ThreadPoolExecutor(self.num_workers) as pool:
                for _ in range(self.num_steps):
                    idxs = self.local_indices(rng)
                    samples = list(pool.map(lambda i: self.dataset[int(i)], idxs))
                    batch = self.collate(samples)
                    batch = {k: v for k, v in batch.items() if k not in self.drop_keys}
                    q.put(self._stage(batch))
        except BaseException as e:  # noqa: BLE001 — propagate to the consumer
            # without this, a producer crash leaves __iter__ blocked on
            # q.get() forever (observed: silent trainer hang)
            q.put(e)
            return
        q.put(None)

    def __iter__(self) -> Iterator[Dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch
