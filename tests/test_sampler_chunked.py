"""Chunked decode must match the host loop (and hence the device loop)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.infer.sampler import generate_chunked, generate_host

CFG = tiny_config()


@pytest.mark.parametrize("chunk", [1, 4, 7])
def test_chunked_matches_host(chunk):
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    kwargs = dict(max_new_tokens=10, temperature=0.0, attn_impl="xla")
    host = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)
    chk = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7), chunk=chunk, **kwargs)

    n = int(host.num_tokens[0])
    assert int(chk.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(host.sequences[0, :n]), np.asarray(chk.sequences[0, :n])
    )
    assert int(chk.num_hands[0]) == int(host.num_hands[0])
    np.testing.assert_allclose(
        np.asarray(chk.pred_hands), np.asarray(host.pred_hands), atol=1e-5
    )


def test_frame_map_dedup_parity():
    """Unique-frame encoding + frame_map gather is bit-identical to encoding
    the tiled duplicates (the EK 10x10 tiling, epic_dataset.py:89-95)."""
    from handsonvlm_tpu.eval.evaluator import InferenceEngine
    from handsonvlm_tpu.models.handsonvlm import encode_video, init_handsonvlm

    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    rng_np = np.random.default_rng(3)
    n_unique = CFG.num_frames // 2
    uniq = rng_np.normal(
        size=(1, n_unique, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    tiled = np.tile(uniq, (1, 2, 1, 1, 1))  # (1, num_frames, ...)

    ded, fmap = InferenceEngine.dedup_frames(tiled)
    assert ded.shape[1] == n_unique
    np.testing.assert_array_equal(ded, uniq)
    np.testing.assert_array_equal(fmap, np.tile(np.arange(n_unique), 2))

    ref = encode_video(params, CFG, jnp.asarray(tiled), attn_impl="xla")
    got = encode_video(
        params, CFG, jnp.asarray(ded), attn_impl="xla", frame_map=jnp.asarray(fmap)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # no-repeat input passes through untouched
    same, fmap2 = InferenceEngine.dedup_frames(
        rng_np.normal(size=(1, 4, 3, 8, 8)).astype(np.float32)
    )
    assert fmap2 is None and same.shape[1] == 4


def test_frame_map_dedup_batched():
    """Per-row dedup at B>1: rows with different unique counts pad to the
    batch max U and gather back bit-identically (batched-serving CLIP
    saving, ROADMAP round-1 item)."""
    from handsonvlm_tpu.eval.evaluator import InferenceEngine
    from handsonvlm_tpu.models.handsonvlm import encode_video, init_handsonvlm

    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    rng_np = np.random.default_rng(9)
    t = CFG.num_frames
    shape = (3, CFG.vision.image_size, CFG.vision.image_size)
    # row 0: t/2 uniques tiled x2; row 1: t/4 uniques tiled x4
    u0 = rng_np.normal(size=(t // 2,) + shape).astype(np.float32)
    u1 = rng_np.normal(size=(t // 4,) + shape).astype(np.float32)
    batch = np.stack([np.tile(u0, (2, 1, 1, 1)), np.tile(u1, (4, 1, 1, 1))])

    ded, fmap = InferenceEngine.dedup_frames(batch)
    assert ded.shape[1] == t // 2 and fmap.shape == (2, t)
    # padding rows repeat the first unique frame
    np.testing.assert_array_equal(ded[1, t // 4], u1[0])

    ref = encode_video(params, CFG, jnp.asarray(batch), attn_impl="xla")
    got = encode_video(
        params, CFG, jnp.asarray(ded), attn_impl="xla", frame_map=jnp.asarray(fmap)
    )
    # same math; XLA fuses the (B*U) CLIP batch differently from (B*T),
    # so equality is float-level rather than bitwise here
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_generate_chunked_with_frame_map():
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    rng_np = np.random.default_rng(5)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    n_unique = CFG.num_frames // 2
    uniq = rng_np.normal(
        size=(1, n_unique, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    tiled = np.tile(uniq, (1, 2, 1, 1, 1))
    fmap = np.tile(np.arange(n_unique), 2)

    kwargs = dict(max_new_tokens=8, temperature=0.0, attn_impl="xla", chunk=4)
    ref = generate_chunked(params, CFG, ids, tiled, jax.random.PRNGKey(1), **kwargs)
    got = generate_chunked(
        params, CFG, ids, uniq, jax.random.PRNGKey(1), frame_map=fmap, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(ref.sequences), np.asarray(got.sequences))
    np.testing.assert_allclose(
        np.asarray(ref.pred_hands), np.asarray(got.pred_hands), atol=1e-6
    )


def test_batched_decode_matches_single():
    """B=2 greedy decode row-for-row equals two B=1 runs (batched serving)."""
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(1)
    images = rng_np.normal(
        size=(2, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    # two different prompts, left-padded to a common length
    ids_a = rng_np.integers(3, 1000, size=(12,)); ids_a[1] = IMAGE_TOKEN_INDEX
    ids_b = rng_np.integers(3, 1000, size=(9,)); ids_b[0] = IMAGE_TOKEN_INDEX
    T = 12
    batch_ids = np.zeros((2, T), np.int64)
    attn = np.zeros((2, T), bool)
    batch_ids[0], attn[0] = ids_a, True
    batch_ids[1, T - 9:], attn[1, T - 9:] = ids_b, True

    kwargs = dict(max_new_tokens=8, temperature=0.0, attn_impl="xla", chunk=4)
    both = generate_chunked(
        params, CFG, batch_ids, images, jax.random.PRNGKey(0), attn_mask=attn, **kwargs
    )
    for i, (ids_i, t_i) in enumerate(((ids_a, 12), (ids_b, 9))):
        pad = np.zeros((1, T), np.int64)
        a = np.zeros((1, T), bool)
        pad[0, T - t_i:], a[0, T - t_i:] = ids_i, True
        solo = generate_chunked(
            params, CFG, pad, images[i:i + 1], jax.random.PRNGKey(0),
            attn_mask=a, **kwargs
        )
        n = int(solo.num_tokens[0])
        assert int(both.num_tokens[i]) == n
        np.testing.assert_array_equal(
            np.asarray(both.sequences[i, :n]), np.asarray(solo.sequences[0, :n])
        )


def test_dispatch_ahead_early_exit(monkeypatch):
    """generate_chunked reads each chunk's finished flag only after the next
    chunk is in flight (dispatch-ahead): on mid-stream EOS it must stop
    after AT MOST one extra chunk and still produce identical outputs."""
    import handsonvlm_tpu.infer.sampler as sampler_mod

    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(1)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    kwargs = dict(max_new_tokens=24, temperature=0.0, attn_impl="xla")
    probe = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)
    # force a deterministic mid-stream EOS: declare the token the greedy
    # rollout actually emits at step 3 to be the EOS id for both loops
    forced_eos = int(np.asarray(probe.sequences[0, 3]))
    kwargs["eos_token_id"] = forced_eos
    ref = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)
    n = int(ref.num_tokens[0])
    assert n <= 8, n  # EOS actually fired early

    calls = {"chunks": 0}
    real_chunk = sampler_mod.decode_chunk

    def counting_chunk(*a, **k):
        calls["chunks"] += 1
        return real_chunk(*a, **k)

    monkeypatch.setattr(sampler_mod, "decode_chunk", counting_chunk)

    out = sampler_mod.generate_chunked(
        params, CFG, ids, images, jax.random.PRNGKey(7), chunk=2, **kwargs)
    # with chunk=2 and the reference producing n tokens, the synchronous
    # loop would dispatch ceil((min(n,24)-1)/2) chunks; dispatch-ahead may
    # add at most ONE more (and never more than the full count)
    n_needed = -(-(min(n, 24) - 1) // 2)
    n_total = -(-(24 - 1) // 2)
    assert calls["chunks"] <= min(n_needed + 1, n_total), (
        calls["chunks"], n_needed, n_total)
    # outputs identical to the host loop regardless of the early exit
    assert int(out.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(ref.sequences[0, :n]), np.asarray(out.sequences[0, :n]))
