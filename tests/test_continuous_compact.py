"""Cache compaction: kernel correctness, plan invariants, bit-equal streams,
and a staggered-arrival soak with zero truncations.

The claim under test (serve/continuous.ContinuousEngine.compact): packing a
row's valid cache BLOCKS to the front preserves the decode kernel's input
sequence exactly — every per-block (content, lane-mask) pair is unchanged,
only block indices shift — so a live request's continued generation is
bit-equal across a compaction event. The reference has no shared cache to
fragment (llava/serve/model_worker.py serves one request per generate)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.ops.cache_ops import build_row_table, gather_cache_blocks
from handsonvlm_tpu.serve.continuous import ContinuousEngine
from handsonvlm_tpu.serve.scheduler import ContinuousScheduler

CFG = tiny_config()
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm  # noqa: E402

PARAMS = init_handsonvlm(jax.random.PRNGKey(42), CFG)


def _prompt(seed, n=10):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(1, n))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)
    return ids, images


# -- kernel ------------------------------------------------------------------


@pytest.mark.parametrize("seq_axis", [2, 3])
def test_gather_blocks_matches_numpy(seq_axis):
    ell, b, s, kh, d, bk = 3, 2, 64, 2, 8, 16
    nk = s // bk
    rng = np.random.default_rng(0)
    if seq_axis == 2:
        c = rng.normal(size=(ell, b, s, kh, d)).astype(np.float32)
    else:
        c = rng.normal(size=(ell, b, kh, s)).astype(np.float32)
    # random left-moving tables (sorted unique sources >= dest index)
    table = np.stack([
        np.sort(rng.choice(nk, size=nk, replace=False)) for _ in range(b)
    ]).astype(np.int32)
    assert (table >= np.arange(nk)).all()

    got = np.asarray(gather_cache_blocks(
        jnp.asarray(c), jnp.asarray(table), block_k=bk, seq_axis=seq_axis))
    want = c.copy()
    for b_ in range(b):
        for j in range(nk):
            src = table[b_, j]
            if seq_axis == 2:
                want[:, b_, j * bk:(j + 1) * bk] = c[:, b_, src * bk:(src + 1) * bk]
            else:
                want[:, b_, :, j * bk:(j + 1) * bk] = c[:, b_, :, src * bk:(src + 1) * bk]
    np.testing.assert_array_equal(got, want)


def test_build_row_table_invariants():
    from handsonvlm_tpu.ops.cache_ops import count_removable_blocks

    bk, nk, s = 16, 8, 128
    rng = np.random.default_rng(1)
    for trial in range(20):
        pos = int(rng.integers(1, s + 1))
        mask = rng.random(s) < 0.4
        mask[pos:] = False
        h_max = count_removable_blocks(mask, pos, bk)
        nb = (pos - 1) // bk + 1
        assert h_max == int((~mask.reshape(nk, bk).any(axis=1))[:nb].sum())
        for h in {0, h_max}:
            table, new_mask = build_row_table(mask, pos, bk, nk, h)
            # left-moving (in-place gather safety)
            assert (table >= np.arange(nk)).all()
            # the ordered valid-block sequence (content + lane masks) is
            # preserved exactly — the bit-equality invariant
            src = np.flatnonzero(mask.reshape(nk, bk).any(axis=1))
            dst = np.flatnonzero(new_mask.reshape(nk, bk).any(axis=1))
            assert dst.shape == src.shape
            np.testing.assert_array_equal(table[dst], src)
            for j, s0 in zip(dst, src):
                np.testing.assert_array_equal(
                    new_mask[j * bk:(j + 1) * bk], mask[s0 * bk:(s0 + 1) * bk])
            assert new_mask.sum() == mask.sum()
            if h:  # each valid block shifts down by the removed empties
                empties = np.flatnonzero(~mask.reshape(nk, bk).any(axis=1))
                expect = np.searchsorted(empties[:h], src)
                np.testing.assert_array_equal(src - dst, expect)


# -- engine: bit-equal streams across a compaction event ----------------------


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_compact_bit_equal_stream(kv_quant):
    """Finish one request (dead bucket at the front), join another behind
    it, then compact mid-generation in engine A only. A and B must produce
    bit-identical tokens AND waypoints for the surviving request."""
    # prompts sized so the bucket spans >= one 256-wide kernel block —
    # compaction works at whole-block granularity and a dead bucket must
    # cover at least one fully-dead block to be reclaimable
    kwargs = dict(slots=2, max_len=1024, chunk=4, temperature=0.5,
                  attn_impl="auto", kv_quant=kv_quant)
    (ids0, im0), (ids1, im1) = _prompt(1, n=120), _prompt(2, n=110)

    def drive(do_compact):
        eng = ContinuousEngine(PARAMS, CFG, **kwargs)
        eng.join(ids0, im0, seed=11, max_new=6)
        eng.step()
        # request 1 joins while 0 is live: its bucket lands BEHIND 0's
        eng.join(ids1, im1, seed=22, max_new=18)
        while eng.slots[0].busy:  # run request 0 out; its bucket goes dead
            eng.step()
        assert eng.slots[1].busy, "request 1 must still be mid-generation"
        pos_dead = eng.pos
        if do_compact:
            reclaimed = eng.compact()
            assert reclaimed > 0, "compaction must reclaim the dead bucket"
            assert eng.pos < pos_dead
        outs = []
        for _ in range(10):
            outs += [o for _, o in eng.step()]
            if outs:
                break
        assert len(outs) == 1
        return outs[0]

    a = drive(True)
    b = drive(False)
    na, nb = int(a.num_tokens[0]), int(b.num_tokens[0])
    assert na == nb
    np.testing.assert_array_equal(a.sequences[0, :na], b.sequences[0, :nb])
    np.testing.assert_array_equal(a.pred_hands, b.pred_hands)
    assert int(a.num_hands[0]) == int(b.num_hands[0])


def test_compact_idle_resets_cursor():
    eng = ContinuousEngine(PARAMS, CFG, slots=1, max_len=512, chunk=4,
                           temperature=0.0, attn_impl="xla")
    ids, im = _prompt(3)
    eng.join(ids, im, seed=5, max_new=3)
    while any(s.busy for s in eng.slots):
        eng.step()
    pos = eng.pos
    assert pos > 0
    # the idle path reclaims the whole cursor without any cache rewrite
    assert eng.compact() == pos
    assert eng.pos == 0 and eng.compactions == 0


# -- soak: staggered arrivals, zero truncations --------------------------------


def test_soak_staggered_no_truncation():
    """50 staggered requests through a small-S engine: every generation
    completes untruncated (EOS or max_new), and compaction fired at least
    once (without it, admission would stall on fragmentation until the
    engine drained or went fully idle)."""
    n_req, max_new = 50, 4
    sched = ContinuousScheduler(
        PARAMS, CFG, slots=2, max_len=1024, chunk=4, temperature=0.7,
        attn_impl="auto")
    outs = {}
    errs = {}

    def one(i):
        ids, im = _prompt(100 + i, n=106 + (i % 5))
        try:
            outs[i] = sched.submit(ids, im, seed=i, max_new=max_new,
                                   timeout=600)
        except Exception as e:  # noqa: BLE001
            errs[i] = repr(e)

    threads = []
    for i in range(n_req):
        t = threading.Thread(target=one, args=(i,))
        t.start()
        threads.append(t)
        time.sleep(0.01)  # staggered arrivals
    for t in threads:
        t.join()

    assert not errs, errs
    assert len(outs) == n_req
    eos = sched.engine.eos
    for i, out in outs.items():
        n = int(out.num_tokens[0])
        assert n == max_new or int(out.sequences[0, n - 1]) == eos, (
            f"request {i} truncated at {n} tokens")
    assert sched.engine.compactions >= 1, (
        "soak never exercised compaction — shrink max_len or add requests")
    sched.stop()
