"""Continuous-batching scheduler: bridges concurrent request threads to the
single-threaded ContinuousEngine (serve/continuous.py).

Why a dedicated loop thread: the engine owns ONE persistent device cache, and
`join`/`step` are device-mutating ops over donated buffers — they must be
issued from one thread in program order. Request threads only enqueue a
ticket and wait on its event; the loop thread admits pending tickets at
chunk boundaries (the engine's contract) and steps the shared batch.

Reference counterpart: `llava/serve/model_worker.py:36-282` serves one
generate per semaphore slot (decode convoys: a long generation blocks the
worker). `serve/batcher.py` (round 2) coalesces requests at PREFILL — all
rows must enter and leave together. This scheduler instead shares the
DECODE batch: a joining request prefills alone (B=1) but decodes alongside
whatever else is live, so short and long generations overlap and a request
finishing frees its slot for the next one mid-flight.

Streaming: `submit(on_tokens=...)` delivers each request's newly decoded
token ids at every chunk boundary (the continuous analogue of the host
loop's per-token `on_token` hook in `infer/sampler.generate_host`).
"""

from __future__ import annotations

import collections
import dataclasses
import heapq
import threading
import time
from typing import Callable, List, Optional

import numpy as np

from handsonvlm_tpu.infer.sampler import EOS_TOKEN_ID, SampleOutput
from handsonvlm_tpu.serve.continuous import ContinuousEngine


class SLORejected(RuntimeError):
    """Raised by submit() when the estimated TTFT exceeds the caller's SLO.

    Load shedding beats silent queueing for latency-sensitive callers: a
    request that cannot meet its deadline should fail in microseconds (so
    the client can retry elsewhere / degrade) rather than burn a queue
    slot to deliver a late answer. The reference stack has no analogue —
    its worker semaphore just queues unboundedly
    (llava/serve/model_worker.py:36-44, limit_model_concurrency)."""


@dataclasses.dataclass
class _Ticket:
    ids: np.ndarray
    images: object  # np or device array — passed through untouched
    seed: int
    max_new: int
    temperature: Optional[float]
    top_p: Optional[float]
    frame_map: Optional[np.ndarray]
    on_tokens: Optional[Callable[[List[int]], None]]
    event: threading.Event = dataclasses.field(default_factory=threading.Event)
    output: Optional[SampleOutput] = None
    error: Optional[str] = None
    sent: int = 0  # tokens already streamed through on_tokens
    t_submit: float = dataclasses.field(default_factory=time.perf_counter)


class ContinuousScheduler:
    """Thread-safe front door for the continuous-batching engine.

    `submit()` blocks the calling thread until its request completes and
    returns the request's SampleOutput, exactly as if it had run solo
    (the engine's composition-independence contract,
    tests/test_continuous.py)."""

    def __init__(self, params, cfg, *, slots: int = 4, max_len: int = 4096,
                 chunk: int = 8, temperature: float = 0.5,
                 top_p: float = 0.9, attn_impl: str = "auto",
                 kv_quant: Optional[str] = None,
                 eos_token_id: int = EOS_TOKEN_ID,
                 max_join_group: int = 8,
                 ttft_slo: Optional[float] = None,
                 admit_hold_s: float = 0.0):
        self.engine = ContinuousEngine(
            params, cfg, slots=slots, max_len=max_len, chunk=chunk,
            temperature=temperature, top_p=top_p, attn_impl=attn_impl,
            kv_quant=kv_quant, eos_token_id=eos_token_id)
        # TTFT SLO admission control: reject a submit whose estimated
        # first-token latency exceeds the SLO (seconds). None = queue
        # unboundedly (the pre-round-4 behavior).
        self.ttft_slo = ttft_slo
        self.slo_rejections = 0
        # EWMAs of the measured decode-step / join dispatch times feed the
        # estimator; None until the first measurement — a cold scheduler
        # never rejects (no basis for a prediction).
        self._step_s: Optional[float] = None
        self._join_s: Optional[float] = None
        # First-call samples are COMPILES (minutes remotely at 7B), not
        # dispatches: folding one into _join_s seeds estimate_ttft() in the
        # hundreds of seconds and every SLO'd submit 429s forever after
        # (rejections prevent joins, so the EWMA can never recover — a
        # livelock). Skip the first sample per compiled program: joins are
        # compiled per (group width, prompt bucket), the step program once
        # per engine. Belt-and-braces: _ewma clamps any later outlier
        # (recompile on a new shape) and persistent rejections admit a
        # probe request so a poisoned estimate can still heal.
        self._compiled_joins: set = set()
        self._step_warm = False
        self._consec_rejections = 0
        # chunk-steps remaining for tickets popped for an in-flight join:
        # they occupy neither _pending nor _live during the dispatch
        # (seconds at 7B) and would otherwise be invisible to the estimator
        self._in_flight_steps: List[int] = []
        # fused-join width cap: the group prefill's transient KV cache is
        # ~n * 270 MB at 7B — n=16 blew HBM by 3 GB (docs/PERF_NOTES.md
        # round 4); n=8 fits beside the serving cache with margin
        self.max_join_group = max_join_group
        # burst coalescing: when the engine is idle and a burst of submits
        # is landing, wait up to this long for stragglers before admitting,
        # so the wave forms ONE full-width fused join instead of a ragged
        # sequence of narrow ones — each narrow width class is a separate
        # remote compile (minutes at 7B) and a separate dispatch (~seconds).
        # 0.0 (default) preserves latency-first admission for serving; the
        # batched evaluator sets ~0.25 s (docs/PERF_NOTES.md round 5).
        self.admit_hold_s = admit_hold_s
        self._pending: collections.deque = collections.deque()
        self._live: dict = {}  # row -> ticket
        self.ttfts: List[float] = []  # submit -> first-token latencies (s)
        self._cv = threading.Condition()
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- request side --------------------------------------------------------

    def submit(self, input_ids, images, *, seed: int, max_new: int,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None, frame_map=None,
               on_tokens: Optional[Callable[[List[int]], None]] = None,
               timeout: Optional[float] = None,
               ttft_slo: Optional[float] = None) -> SampleOutput:
        # ids stay host-side (shape checks); images pass through untouched —
        # an np.asarray here would round-trip a device array over the tunnel
        t = _Ticket(np.asarray(input_ids), images, seed, max_new,
                    temperature, top_p, frame_map, on_tokens)
        slo = self.ttft_slo if ttft_slo is None else ttft_slo
        with self._cv:
            if self._stopped:
                raise RuntimeError("scheduler stopped")
            if slo is not None:
                est = self.estimate_ttft()
                if est is not None and est > slo:
                    # probe admission: if the estimate has rejected many
                    # submits in a row it may be stale (no joins happen
                    # while everything is rejected, so the EWMAs freeze);
                    # let one request through to refresh the measurements
                    if self._consec_rejections >= 8:
                        self._consec_rejections = 0
                    else:
                        self.slo_rejections += 1
                        self._consec_rejections += 1
                        raise SLORejected(
                            f"estimated TTFT {est:.2f}s exceeds SLO "
                            f"{slo:.2f}s ({len(self._pending)} queued, "
                            f"{len(self._live)} decoding)")
            self._consec_rejections = 0
            self._pending.append(t)
            self._cv.notify()
        if not t.event.wait(timeout):
            raise TimeoutError("continuous generate timed out")
        if t.error is not None:
            raise RuntimeError(t.error)
        return t.output

    def stop(self):
        with self._cv:
            self._stopped = True
            self._cv.notify()
        self._thread.join(timeout=30)

    # -- TTFT SLO estimator ---------------------------------------------------

    @staticmethod
    def _estimate_steps(free_slots: int, live_remaining: List[int],
                        queued_steps: List[int]) -> Optional[int]:
        """Decode steps until a slot frees for a request arriving at the back
        of the queue: simulate slot recycling (free slots serve the queue
        first; live rows free after their remaining steps; each queued
        request then occupies its slot for its own full decode). Upper
        bound — early EOS frees slots sooner, never later."""
        frees = [0] * free_slots + sorted(live_remaining)
        if not frees:
            return None
        heapq.heapify(frees)
        for qs in queued_steps:
            heapq.heappush(frees, heapq.heappop(frees) + qs)
        return frees[0]

    def estimate_ttft(self) -> Optional[float]:
        """Predicted submit->first-token latency for a request submitted NOW
        (seconds), or None while the scheduler is cold (no measured step /
        join times yet — a cold scheduler admits everything). Called under
        self._cv; engine state is only mutated by the loop thread, and the
        estimate tolerates a mid-step read (GIL-atomic list/int reads)."""
        if self._step_s is None or self._join_s is None:
            return None
        eng = self.engine
        free = sum(1 for s in eng.slots if not s.busy)
        live = [max(1, -(-(s.max_new - len(s.tokens)) // eng.chunk))
                for s in eng.slots if s.busy]
        # tickets popped for an in-flight join_many occupy neither _pending
        # nor _live for the duration of the dispatch; count them as live
        # rows with their full decode remaining (they consume those slots)
        live = live + list(self._in_flight_steps)
        free = max(0, free - len(self._in_flight_steps))
        queued = [max(1, -(-p.max_new // eng.chunk)) for p in self._pending]
        steps = self._estimate_steps(free, live, queued)
        if steps is None:
            return None
        # join dispatches ahead of ours also serialize on the loop thread:
        # ~one join per max_join_group queued requests, plus our own
        n_joins = 1 + -(-len(queued) // max(1, self.max_join_group))
        return steps * self._step_s + n_joins * self._join_s

    def _ewma(self, attr: str, dt: float, alpha: float = 0.3):
        prev = getattr(self, attr)
        if prev is not None and dt > 10 * prev:
            # recompile / hiccup outlier: clamp rather than drop, so a
            # sustained genuine slowdown still walks the estimate up
            dt = 10 * prev
        setattr(self, attr, dt if prev is None else
                (1 - alpha) * prev + alpha * dt)

    # -- loop side (single thread owns the engine) ---------------------------

    def _loop(self):
        while True:
            with self._cv:
                while (not self._stopped and not self._pending
                       and not self._live):
                    self._cv.wait()
                if self._stopped:
                    for t in self._pending:
                        t.error = "scheduler stopped"
                        t.event.set()
                    self._pending.clear()
                    for t in self._live.values():
                        t.error = "scheduler stopped"
                        t.event.set()
                    self._live.clear()
                    return
            try:
                self._admit()
                if self._live:
                    self._step_once()
            except Exception as e:  # noqa: BLE001 — a dead loop thread would
                # strand every submitter; fail them loudly instead
                msg = f"scheduler loop error: {type(e).__name__}: {e}"
                with self._cv:
                    self._stopped = True
                    for t in self._pending:
                        t.error = msg
                        t.event.set()
                    self._pending.clear()
                for t in self._live.values():
                    t.error = msg
                    t.event.set()
                self._live.clear()
                raise

    @staticmethod
    def _shape_key(t: _Ticket):
        """Tickets groupable into one fused join must agree on the device
        array shapes the batched prefill stacks (prompt lengths may differ
        — the engine left-pads). Read `.shape` attributes only: frame_map
        is usually a DEVICE array, and np.asarray on it is a full
        device_get — a ~35 ms tunnel sync on EVERY admission-loop pass
        (found by tools/perf_eval_breakdown.py, round 5)."""
        fm = getattr(t.frame_map, "shape", None)
        if fm is None and t.frame_map is not None:
            fm = np.asarray(t.frame_map).shape  # plain list fallback
        return (getattr(t.images, "shape", None), fm)

    def _admit(self):
        """Move pending tickets into free engine slots (chunk boundary).

        Consecutive shape-compatible tickets are admitted as ONE fused
        group join (engine.join_many): one CLIP encode + prefill dispatch
        and one shared prompt bucket for the whole group. Group sizes are
        rounded down to powers of two so the set of compiled join
        programs stays small (each remote 7B compile is minutes)."""
        eng = self.engine
        if self.admit_hold_s > 0:
            # idle-engine burst coalescing (see __init__): only when nothing
            # is decoding — with live rows the loop paces at step time and
            # arrivals accumulate between steps on their own
            deadline = time.perf_counter() + self.admit_hold_s
            # a join can never be wider than free slots, so stop holding as
            # soon as the pending wave covers min(free, max_join_group)
            free = sum(1 for s in eng.slots if not s.busy)
            target = max(1, min(free, self.max_join_group))
            with self._cv:
                while (not self._stopped and self._pending and not self._live
                       and len(self._pending) < target):
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
        while True:
            group: List[_Ticket] = []
            with self._cv:
                if not self._pending:
                    return
                head = self._pending[0]
                plen = head.ids.shape[1]
                if not eng.can_admit(plen):
                    # defrag before giving up: finished requests leave dead
                    # buckets behind that a block-aligned compaction can
                    # reclaim without disturbing live rows (bit-equal
                    # streams; ContinuousEngine.compact)
                    eng.compact()
                if not eng.can_admit(plen):
                    # a prompt too big to EVER fit must be failed, not queued
                    # forever: when the engine is empty can_admit is maximal
                    if eng.idle() and not self._live:
                        self._pending.popleft()
                        head.error = (
                            f"prompt ({plen} tokens) exceeds engine capacity "
                            f"(max_len={eng.s})")
                        head.event.set()
                        continue
                    return  # wait for live requests to finish / free space
                free = sum(1 for s in eng.slots if not s.busy)
                key = self._shape_key(head)
                cap = max(1, min(free, self.max_join_group))
                limit = 1 << (cap.bit_length() - 1)  # pow2 <= min(free, cap)
                while (self._pending and len(group) < limit
                       and self._shape_key(self._pending[0]) == key
                       and eng.can_admit(
                           max([self._pending[0].ids.shape[1]]
                               + [g.ids.shape[1] for g in group]))):
                    group.append(self._pending.popleft())
                # shrink to a power of two (1,2,4,...) to bound compiles
                keep = 1 << (len(group).bit_length() - 1)
                while len(group) > keep:
                    self._pending.appendleft(group.pop())
                # popped tickets stay visible to estimate_ttft for the
                # duration of the join dispatch (seconds at 7B)
                self._in_flight_steps = [
                    max(1, -(-t.max_new // eng.chunk)) for t in group]
            try:
                join_key = (len(group),
                            eng._bucket(max(t.ids.shape[1] for t in group)))
                t_join = time.perf_counter()
                rows = eng.join_many([
                    dict(input_ids=t.ids, images=t.images, seed=t.seed,
                         max_new=t.max_new, temperature=t.temperature,
                         top_p=t.top_p, frame_map=t.frame_map)
                    for t in group])
                if join_key in self._compiled_joins:
                    self._ewma("_join_s", time.perf_counter() - t_join)
                else:
                    # first call at this (width, bucket) includes the
                    # compile — minutes remotely; poisonous to the EWMA
                    self._compiled_joins.add(join_key)
            except Exception as e:  # noqa: BLE001
                self._in_flight_steps = []
                if len(group) == 1:
                    group[0].error = str(e)
                    group[0].event.set()
                    continue
                # a failed GROUP join (e.g. the fused prefill's transient
                # memory at this width/bucket) must not fail n user
                # requests: requeue them and halve the group-width cap —
                # repeated failures degrade to solo admission
                self.max_join_group = max(1, len(group) // 2)
                with self._cv:
                    for t in reversed(group):
                        self._pending.appendleft(t)
                continue
            self._in_flight_steps = []
            for row, t in zip(rows, group):
                # the join produced the request's first token — TTFT ends here
                self.ttfts.append(time.perf_counter() - t.t_submit)
                self._live[row] = t
                self._stream(row, t)
                # first token may already be EOS / max_new==1
                slot = eng.slots[row]
                if slot.done or len(slot.tokens) >= slot.max_new:
                    out = eng._finalize(slot)
                    eng.slots[row] = type(slot)()
                    self._finish(row, out)

    def _step_once(self):
        eng = self.engine
        if eng.pos + eng.chunk > eng.s:
            # cursor exhausted with rows still live: reclaim dead blocks
            # first; truncation (drain) is the last resort when even the
            # compacted live content fills the cache
            eng.compact()
        if eng.pos + eng.chunk > eng.s:
            done = eng.drain()
        else:
            t_step = time.perf_counter()
            done = eng.step()
            if self._step_warm:
                self._ewma("_step_s", time.perf_counter() - t_step)
            else:
                # first step compiles the decode program — skip the sample
                self._step_warm = True
        for row, out in done:
            self._finish(row, out)
        for row, t in list(self._live.items()):
            self._stream(row, t)

    def _stream(self, row, t: _Ticket):
        if t.on_tokens is None:
            return
        slot = self.engine.slots[row]
        if slot.busy and len(slot.tokens) > t.sent:
            t.on_tokens(list(slot.tokens[t.sent:]))
            t.sent = len(slot.tokens)

    def _finish(self, row, out: SampleOutput):
        t = self._live.pop(row)
        if t.on_tokens is not None:
            n = int(out.num_tokens[0])
            if n > t.sent:
                t.on_tokens([int(x) for x in out.sequences[0, t.sent:n]])
                t.sent = n
        t.output = out
        t.event.set()
