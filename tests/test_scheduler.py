"""Continuous-batching scheduler (serve/scheduler.py): request threads in,
solo-parity streams out.

Oracles:
1. N concurrent submits with heterogeneous decode settings (greedy + two
   sampled temperatures) each match their SOLO ContinuousEngine run exactly
   (tokens and waypoints) — the engine's composition-independence contract
   survives the threading layer, and per-row temperature/top_p keep
   heterogeneous requests from perturbing each other.
2. Chunk-boundary streaming (`on_tokens`) delivers exactly the final
   sequence, in order.
3. Capacity: more requests than slots queue and all complete; a prompt that
   can never fit is rejected with an error instead of queuing forever.
4. Cursor exhaustion mid-flight truncates honestly (drain) — no deadlock.
5. Worker e2e: ModelWorker(--continuous) over HTTP, generate + stream.
"""

import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.serve.continuous import ContinuousEngine
from handsonvlm_tpu.serve.scheduler import ContinuousScheduler

CFG = tiny_config()
PARAMS = init_handsonvlm(jax.random.PRNGKey(42), CFG)
ENGINE_KW = dict(max_len=512, chunk=4, attn_impl="xla")


def _prompt(seed, n=10):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(1, n))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)
    return ids, images


def _solo(ids, images, seed, max_new, temperature, top_p=0.9):
    eng = ContinuousEngine(PARAMS, CFG, slots=1, **ENGINE_KW)
    eng.join(ids, images, seed=seed, max_new=max_new,
             temperature=temperature, top_p=top_p)
    while True:
        done = eng.step()
        if done:
            return done[0][1]


def test_concurrent_heterogeneous_parity_and_streaming():
    sched = ContinuousScheduler(PARAMS, CFG, slots=2, **ENGINE_KW)
    reqs = [  # (seed, temperature) — greedy shares the batch with sampled
        (3, 0.0), (4, 0.7), (5, 0.5)
    ]
    streamed = {}
    outs = {}
    errs = {}

    def run(i, seed, temp):
        chunks = []
        try:
            outs[i] = sched.submit(
                *_prompt(seed), seed=seed, max_new=10, temperature=temp,
                on_tokens=chunks.append, timeout=600)
            streamed[i] = [t for c in chunks for t in c]
        except Exception as e:  # noqa: BLE001
            errs[i] = e

    threads = [threading.Thread(target=run, args=(i, s, t))
               for i, (s, t) in enumerate(reqs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    sched.stop()
    assert not errs, errs
    for i, (seed, temp) in enumerate(reqs):
        ids, images = _prompt(seed)
        ref = _solo(ids, images, seed, 10, temp)
        n = int(ref.num_tokens[0])
        assert int(outs[i].num_tokens[0]) == n
        np.testing.assert_array_equal(
            outs[i].sequences[0, :n], ref.sequences[0, :n])
        np.testing.assert_array_equal(outs[i].pred_hands, ref.pred_hands)
        # streaming delivered exactly the final sequence, in order
        assert streamed[i] == [int(x) for x in ref.sequences[0, :n]]


def test_queueing_beyond_slots_and_oversize_rejection():
    sched = ContinuousScheduler(PARAMS, CFG, slots=1, **ENGINE_KW)
    try:
        outs = {}

        def run(i):
            ids, images = _prompt(10 + i)
            outs[i] = sched.submit(ids, images, seed=10 + i, max_new=6,
                                   temperature=0.0, timeout=600)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert sorted(outs) == [0, 1, 2]
        for i in range(3):
            ids, images = _prompt(10 + i)
            ref = _solo(ids, images, 10 + i, 6, 0.0)
            n = int(ref.num_tokens[0])
            np.testing.assert_array_equal(
                outs[i].sequences[0, :n], ref.sequences[0, :n])

        # a prompt whose bucket can never fit max_len errors out immediately
        rng = np.random.default_rng(0)
        big = rng.integers(3, 1000, size=(1, 600))
        big[0, 1] = IMAGE_TOKEN_INDEX
        _, images = _prompt(0)
        with pytest.raises(RuntimeError, match="exceeds engine capacity"):
            sched.submit(big, images, seed=1, max_new=4, timeout=600)
    finally:
        sched.stop()


def test_cursor_exhaustion_truncates_not_deadlocks():
    # bucket(10-token prompt) = 128; max_len 144 leaves two 8-token chunks:
    # at most 1 + 16 tokens before the shared cursor runs dry
    sched = ContinuousScheduler(PARAMS, CFG, slots=1, max_len=144, chunk=8,
                                attn_impl="xla")
    try:
        ids, images = _prompt(0)
        out = sched.submit(ids, images, seed=9, max_new=32,
                           temperature=0.0, timeout=600)
        n = int(out.num_tokens[0])
        assert 1 <= n <= 17  # truncated by drain, not max_new
    finally:
        sched.stop()


def test_worker_continuous_e2e():
    from handsonvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        None, "http://127.0.0.1:0", "random:tiny", preset="tiny",
        model_name="handsonvlm-tiny", continuous_slots=2,
        continuous_max_len=512,
    )
    server = serve_worker(worker, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", json.dumps(payload).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.read()

        # two concurrent generates share the decode batch (different temps)
        results = {}

        def gen(i, temp):
            results[i] = json.loads(post("/worker_generate", {
                "prompt": f"Where should my hand move {i}?",
                "max_new_tokens": 6, "temperature": temp,
            }))

        threads = [threading.Thread(target=gen, args=(i, t))
                   for i, t in enumerate([0.0, 0.7])]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        for i in range(2):
            assert results[i]["error_code"] == 0
            assert np.asarray(results[i]["pred_hands"]).shape == (1, 2, 4, 2)

        # streamed: \0-delimited accumulated text, final carries the traj
        raw = post("/worker_generate_stream",
                   {"prompt": "Where?", "max_new_tokens": 6})
        chunks = [json.loads(c) for c in raw.split(b"\0") if c]
        assert all(c["error_code"] == 0 for c in chunks)
        texts = [c["text"] for c in chunks]
        assert all(texts[i + 1].startswith(texts[i])
                   for i in range(len(texts) - 2))
        assert chunks[-1].get("finish") and "pred_hands" in chunks[-1]
    finally:
        worker.stop()
        server.shutdown()


def test_grouped_admission_parity(monkeypatch):
    """A burst of 4 same-shape submits against an all-free engine admits
    as ONE fused group join (join_group_sizes records a 4) and every
    request still matches its solo run exactly."""
    # gate the loop thread's admission so all 4 tickets are provably
    # pending at one chunk boundary (ungated, admission races enqueueing
    # and the group splits nondeterministically)
    gate = threading.Event()
    orig_admit = ContinuousScheduler._admit

    def gated_admit(self):
        gate.wait(timeout=120)
        orig_admit(self)

    monkeypatch.setattr(ContinuousScheduler, "_admit", gated_admit)
    sched = ContinuousScheduler(PARAMS, CFG, slots=4, **ENGINE_KW)
    reqs = [(31, 0.5), (32, 0.0), (33, 0.7), (34, 0.5)]
    prompts = {seed: _prompt(seed, n=8 + i) for i, (seed, _) in enumerate(reqs)}
    outs = {}
    errs = {}

    threads = []
    for seed, temp in reqs:
        def run(seed=seed, temp=temp):
            try:
                outs[seed] = sched.submit(
                    *prompts[seed], seed=seed, max_new=8,
                    temperature=temp, timeout=120)
            except Exception as e:  # noqa: BLE001
                errs[seed] = repr(e)
        t = threading.Thread(target=run)
        t.start()
        threads.append(t)
    with sched._cv:
        assert sched._cv.wait_for(
            lambda: len(sched._pending) == 4, timeout=60)
    gate.set()
    for t in threads:
        t.join(timeout=120)
    sched.stop()
    assert not errs, errs
    assert 4 in sched.engine.join_group_sizes, sched.engine.join_group_sizes
    for seed, temp in reqs:
        ref = _solo(*prompts[seed], seed=seed, max_new=8, temperature=temp)
        out = outs[seed]
        n = int(out.num_tokens[0])
        assert n == int(ref.num_tokens[0])
        np.testing.assert_array_equal(
            np.asarray(out.sequences[0, :n]),
            np.asarray(ref.sequences[0, :n]))
        np.testing.assert_allclose(np.asarray(out.pred_hands),
                                   np.asarray(ref.pred_hands), atol=1e-6)


def test_group_join_failure_degrades_to_solo(monkeypatch):
    """A failing fused group join requeues its tickets and halves the
    group-width cap instead of failing n user requests; the retry admits
    solo and every request completes."""
    gate = threading.Event()
    orig_admit = ContinuousScheduler._admit

    def gated_admit(self):
        gate.wait(timeout=120)
        orig_admit(self)

    monkeypatch.setattr(ContinuousScheduler, "_admit", gated_admit)
    sched = ContinuousScheduler(PARAMS, CFG, slots=4, **ENGINE_KW)
    eng = sched.engine
    orig_join_many = eng.join_many
    fails = {"n": 0}

    def flaky_join_many(requests):
        if len(requests) > 1:
            fails["n"] += 1
            raise RuntimeError("synthetic group-join failure")
        return orig_join_many(requests)

    monkeypatch.setattr(eng, "join_many", flaky_join_many)
    outs = {}
    errs = {}
    threads = []
    for seed in (51, 52, 53, 54):
        def run(seed=seed):
            try:
                outs[seed] = sched.submit(*_prompt(seed), seed=seed,
                                          max_new=6, temperature=0.0,
                                          timeout=120)
            except Exception as e:  # noqa: BLE001
                errs[seed] = repr(e)
        t = threading.Thread(target=run)
        t.start()
        threads.append(t)
    with sched._cv:
        assert sched._cv.wait_for(
            lambda: len(sched._pending) == 4, timeout=60)
    gate.set()
    for t in threads:
        t.join(timeout=120)
    sched.stop()
    assert not errs, errs
    assert len(outs) == 4
    assert fails["n"] >= 1  # the group path was exercised and failed
    assert sched.max_join_group == 1  # 4 -> 2 -> 1


def test_slo_estimator_steps():
    """Pure slot-recycling simulation (scheduler._estimate_steps):
    upper-bound decode steps until a slot frees for the newest arrival."""
    est = ContinuousScheduler._estimate_steps
    assert est(2, [], []) == 0            # free slot now
    assert est(0, [5], []) == 5           # wait for the live row
    assert est(0, [5, 2], []) == 2        # earliest of two live rows
    assert est(1, [5], [3]) == 3          # queued head takes the free slot
    # two queued ahead on one slot: head at 0..3, second 3..7, ours at 7
    assert est(1, [], [3, 4]) == 7
    # queue drains across recycling slots: frees at [0,2]; q1->0+3=3,
    # q2->2+3=5, ours at min(3,5)=3
    assert est(1, [2], [3, 3]) == 3
    assert est(0, [], []) is None         # no slots at all


def test_slo_probe_admission_recovers_poisoned_estimate():
    """ADVICE r4: a poisoned estimate (e.g. a compile-latency sample folded
    into _join_s) must not 429 forever — after 8 consecutive rejections one
    probe request is admitted so the EWMAs can refresh."""
    sched = ContinuousScheduler(PARAMS, CFG, slots=1, **ENGINE_KW)
    try:
        ids, images = _prompt(0)
        sched._step_s = 500.0
        sched._join_s = 500.0  # est >= _join_s >> any sane SLO
        from handsonvlm_tpu.serve.scheduler import SLORejected
        for _ in range(8):
            with pytest.raises(SLORejected, match="exceeds SLO"):
                sched.submit(ids, images, seed=2, max_new=4,
                             temperature=0.0, timeout=600, ttft_slo=0.5)
        assert sched.slo_rejections == 8
        # the 9th is admitted as a probe despite the stale estimate
        out = sched.submit(ids, images, seed=3, max_new=4, temperature=0.0,
                           timeout=600, ttft_slo=0.5)
        assert int(out.num_tokens[0]) >= 1
    finally:
        sched.stop()


def test_slo_rejects_when_saturated_and_admits_when_loose():
    sched = ContinuousScheduler(PARAMS, CFG, slots=1, **ENGINE_KW)
    try:
        ids, images = _prompt(0)
        done = {}

        # warm the estimator: first-call join/step samples are treated as
        # compiles and excluded from the EWMAs (the round-4 livelock fix),
        # so one full request must complete before estimates exist
        sched.submit(ids, images, seed=1, max_new=4, temperature=0.0,
                     timeout=600)

        def run_long():
            done["out"] = sched.submit(ids, images, seed=7, max_new=60,
                                       temperature=0.0, timeout=600)

        th = threading.Thread(target=run_long)
        th.start()
        # wait until the long request is decoding and the estimator is warm
        import time as _time
        deadline = _time.time() + 300
        while _time.time() < deadline and (
                sched._step_s is None or sched._join_s is None
                or not sched._live):
            _time.sleep(0.01)
        assert sched._step_s is not None and sched._live

        # slot saturated: a tiny SLO must shed, not queue
        from handsonvlm_tpu.serve.scheduler import SLORejected
        with pytest.raises(SLORejected, match="exceeds SLO"):
            sched.submit(ids, images, seed=8, max_new=4, temperature=0.0,
                         timeout=600, ttft_slo=1e-9)
        assert sched.slo_rejections == 1

        # a loose SLO (and the default None) still queue and complete
        out2 = sched.submit(ids, images, seed=8, max_new=4, temperature=0.0,
                            timeout=600, ttft_slo=1e6)
        assert int(out2.num_tokens[0]) >= 1
        th.join(timeout=600)
        assert "out" in done
    finally:
        sched.stop()
