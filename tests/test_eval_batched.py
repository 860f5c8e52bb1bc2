"""Batched EK100 eval (--batched): metrics are composition-independent.

evaluate_epic_kitchen_traj(batched=N) routes every (clip, sample) decode
through the continuous-batching scheduler. Per-row rng and rotary positions
are EXACT under composition (tests/test_continuous.py); logits are exact up
to floating-point reassociation — a row's keys sit at different global
cache offsets per composition, regrouping attention partial sums at the ulp
level. Those ulp seeds are NOT static: each step's K/V projections depend
on that step's attention output, so perturbations enter the cache and grow
step over step (measured: greedy streams across compositions agree for ~8
tokens then flip one argmax, tiny fp32, on the XLA and Pallas paths alike).
Batched eval is therefore statistically equivalent to serial eval — the
same class of difference as changing the sampling seed, which the
stochastic EK protocol (temp 0.5) already averages over — with exact
stream equality over short horizons."""

import numpy as np
import jax
import pytest

from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.eval.evaluator import InferenceEngine, evaluate_epic_kitchen_traj
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

from tests.test_evaluator import StubDataset

CFG = tiny_config()


@pytest.mark.parametrize("num_samples", [1, 2])
def test_batched_eval_matches_slots1_greedy(num_samples):
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    engine = InferenceEngine(
        params=params, cfg=CFG, tokenizer=MockTokenizer(), max_new_tokens=6,
        temperature=0.0,
    )
    kwargs = dict(seed=3, log_every=0, num_samples=num_samples,
                  batched_max_len=1024, batched_chunk=4)
    solo = evaluate_epic_kitchen_traj(engine, StubDataset(4), batched=1,
                                      **kwargs)
    shared = evaluate_epic_kitchen_traj(engine, StubDataset(4), batched=3,
                                        **kwargs)
    assert solo["n"] == shared["n"]
    assert len(shared["val_info"]) == 4
    flips = 0
    for i in solo["val_info"]:
        va, vb = solo["val_info"][i], shared["val_info"][i]
        ta, tb = va["text"].split(), vb["text"].split()
        assert len(ta) == len(tb)
        # first token: sampled off the B=1 transient-prefill hidden state,
        # which never touches the shared cache — EXACT under composition
        assert ta[0] == tb[0], (i, va["text"], vb["text"])
        # later tokens read the shared cache at composition-dependent
        # offsets: identical bytes, regrouped fp reductions — argmax can
        # flip on near-ties and the flip compounds through the cache
        # (module docstring). Bound it: at most one divergence ONSET per
        # clip in this tiny config (a systematic bug flips everything).
        prefix = 0
        for x, y in zip(ta, tb):
            if x != y:
                break
            prefix += 1
        flips += prefix < len(ta)
        assert prefix >= 1
    assert flips <= 2, (flips, "divergence should be rare near-ties, "
                        "not systematic")


def test_batched_eval_sampled_runs():
    """Temperature > 0 through the shared batch: the loop completes and
    produces a well-formed result (stream-level equality is only a
    temperature-0 guarantee — module docstring)."""
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    engine = InferenceEngine(
        params=params, cfg=CFG, tokenizer=MockTokenizer(), max_new_tokens=6,
        temperature=0.7,
    )
    result = evaluate_epic_kitchen_traj(
        engine, StubDataset(3), batched=2, seed=1, log_every=0,
        batched_max_len=1024, batched_chunk=4)
    assert set(result) == {"ade", "fde", "wde", "n", "val_info"}
    assert len(result["val_info"]) == 3


def test_batched_eval_joins_at_full_width(monkeypatch):
    """Burst coalescing (round 5): request prep happens off the submit path
    and the scheduler holds idle-engine admission briefly, so an n-clip
    burst forms FULL-width fused joins ([slots, slots, ...]) instead of a
    ragged arrival-timing-dependent sequence (each narrow width class is a
    separate compiled join program — minutes each remotely at 7B)."""
    from handsonvlm_tpu.serve.continuous import ContinuousEngine

    widths = []
    orig = ContinuousEngine.join_many

    def logged(self, reqs):
        widths.append(len(reqs))
        return orig(self, reqs)

    monkeypatch.setattr(ContinuousEngine, "join_many", logged)
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    engine = InferenceEngine(
        params=params, cfg=CFG, tokenizer=MockTokenizer(), max_new_tokens=6,
        temperature=0.0,
    )
    evaluate_epic_kitchen_traj(
        engine, StubDataset(8), batched=4, seed=1, log_every=0,
        batched_max_len=1024, batched_chunk=4)
    assert widths == [4, 4], widths


def test_batched_scheduler_reused_across_calls():
    """The engine owns ONE scheduler per (slots, max_len, chunk), reused
    across evaluate calls: per-call schedulers each allocate a multi-GB
    slots cache, and freed device memory never returns on the TPU tunnel
    (OOM / allocator thrash — docs/PERF_NOTES.md round 5)."""
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    engine = InferenceEngine(
        params=params, cfg=CFG, tokenizer=MockTokenizer(), max_new_tokens=4,
        temperature=0.0,
    )
    kwargs = dict(seed=3, log_every=0, batched=2,
                  batched_max_len=1024, batched_chunk=4)
    evaluate_epic_kitchen_traj(engine, StubDataset(2), **kwargs)
    sched1 = engine._batched_scheds[(2, 1024, 4)]
    assert sched1._thread.is_alive()  # kept for reuse, not stopped
    evaluate_epic_kitchen_traj(engine, StubDataset(2), **kwargs)
    assert engine._batched_scheds[(2, 1024, 4)] is sched1
