"""Dynamic request batching for the model worker.

The reference serves one request per generate call (llava model_worker
semaphore). On TPU, batch-1 decode is HBM-bandwidth-bound — weights stream
once per step regardless of batch — so co-scheduling concurrent requests
into one `generate_chunked(B)` call multiplies throughput at nearly flat
latency (tests/test_sampler_chunked.py::test_batched_decode_matches_single
shows row-exact parity with solo decodes).

`DynamicBatcher.submit` blocks until the result is ready; a collector
thread drains the queue, waits up to `max_wait_ms` for co-arrivals (never
delaying a lone request by more than that), and runs the engine once per
batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional

import numpy as np


class DynamicBatcher:
    def __init__(self, engine, max_batch: int = 8, max_wait_ms: float = 30.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.queue: "queue.Queue" = queue.Queue()
        self.batches_run = 0
        self.requests_served = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._collect_loop, daemon=True)
        self._thread.start()

    def submit(
        self,
        question: str,
        frames: np.ndarray,
        seed: int,
        timeout=600.0,
        lora: Optional[str] = None,
        params=None,
    ):
        """frames: (T, 3, H, W) for ONE request. Blocks until decoded.
        Returns (pred (2,4,2), valid bool, gen_ids).

        ``lora`` keys adapter grouping (only same-adapter requests share a
        decode batch — one lora tree per generate call); ``params`` is the
        full per-request params dict for that adapter (lora_registry)."""
        fut: Future = Future()
        self.queue.put((question, frames, seed, fut, lora, params))
        return fut.result(timeout=timeout)

    def stop(self):
        self._stop.set()

    def _collect_loop(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = self.max_wait
            import time

            t0 = time.monotonic()
            while len(batch) < self.max_batch:
                remaining = deadline - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # partition by adapter: one lora tree per generate call
            groups: dict = {}
            for req in batch:
                groups.setdefault(req[4], []).append(req)
            for group in groups.values():
                self._run(group)

    def _run(self, batch: List):
        import jax

        questions = [b[0] for b in batch]
        frames = [b[1] for b in batch]
        seed = batch[0][2]
        futures = [b[3] for b in batch]
        params = batch[0][5]
        # pad to the next power of two: bounded set of decode programs
        # (1,2,4,8,...) instead of one compile per co-arrival count
        n = len(batch)
        target = 1
        while target < n:
            target *= 2
        while len(questions) < target:
            questions.append(questions[0])
            frames.append(frames[0])
        frames = np.stack(frames)  # (B_padded, T, 3, H, W)
        try:
            pred, valid, gen_ids = self.engine.infer_batch(
                questions, frames, jax.random.PRNGKey(seed), params=params
            )
            self.batches_run += 1
            self.requests_served += len(batch)
            for i, fut in enumerate(futures):
                fut.set_result((pred[i], bool(valid[i]), gen_ids[i]))
        except Exception as e:  # noqa: BLE001 — fail every waiter, not the loop
            for fut in futures:
                if not fut.done():
                    fut.set_exception(e)
