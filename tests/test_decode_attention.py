"""Pallas decode attention vs the XLA reference."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from handsonvlm_tpu.ops.attention import attention_xla
from handsonvlm_tpu.ops.decode_attention import decode_attention


def _setup(b=2, s=50, h=4, kh=None, d=32, length=37, seed=0):
    kh = kh or h
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    # reference: mask out everything past `length`
    mask = np.zeros((b, s), bool)
    mask[:, :length] = True
    return q, k, v, jnp.asarray(mask), length


def test_matches_xla():
    q, k, v, mask, length = _setup()
    ref = attention_xla(q, k, v, key_mask=mask, causal=True, q_offset=length - 1)
    got = decode_attention(q, k, v, length, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_extra_key_mask():
    q, k, v, mask, length = _setup(seed=1)
    extra = np.array(mask)
    extra[:, 5:9] = False  # padding inside the prompt
    extra = jnp.asarray(extra)
    ref = attention_xla(q, k, v, key_mask=extra, causal=True, q_offset=length - 1)
    got = decode_attention(q, k, v, length, key_mask=extra, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gqa():
    q, k, v, mask, length = _setup(h=8, kh=2, seed=2)
    ref = attention_xla(q, k, v, key_mask=mask, causal=True, q_offset=length - 1)
    got = decode_attention(q, k, v, length, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("length", [1, 50])
def test_boundary_lengths(length):
    q, k, v, _, _ = _setup(length=50)
    mask = np.zeros((2, 50), bool)
    mask[:, :length] = True
    ref = attention_xla(q, k, v, key_mask=jnp.asarray(mask), causal=True, q_offset=length - 1)
    got = decode_attention(q, k, v, length, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def _setup_stacked(L=3, b=2, s=48, h=4, kh=None, d=32, length=37, seed=0):
    kh = kh or h
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, b, s, kh, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, b, s, kh, d)), jnp.float32)
    mask = np.zeros((b, s), bool)
    mask[:, :length] = True
    return q, ck, cv, jnp.asarray(mask), length


@pytest.mark.parametrize("layer", [0, 2])
def test_stacked_matches_xla(layer):
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    q, ck, cv, mask, length = _setup_stacked(seed=3)
    ref = attention_xla(
        q, ck[layer], cv[layer], key_mask=mask, causal=True, q_offset=length - 1
    )
    got = decode_attention_stacked(q, ck, cv, layer, length, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_stacked_gqa_and_mask():
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    q, ck, cv, mask, length = _setup_stacked(h=8, kh=2, seed=4)
    extra = np.array(mask)
    extra[:, 5:9] = False  # left-padding holes inside the prompt
    extra = jnp.asarray(extra)
    ref = attention_xla(q, ck[1], cv[1], key_mask=extra, causal=True, q_offset=length - 1)
    got = decode_attention_stacked(q, ck, cv, 1, length, key_mask=extra, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_stacked_matches_decode_kernel():
    """Same numerics as the per-layer kernel across every layer index."""
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    q, ck, cv, mask, length = _setup_stacked(L=4, seed=5)
    for layer in range(4):
        ref = decode_attention(q, ck[layer], cv[layer], length, block_k=16)
        got = decode_attention_stacked(q, ck, cv, layer, length, block_k=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_stacked_window_matches_per_position():
    """t>1 verify window (speculative decode): the windowed kernel equals
    T independent single-position calls with per-row lengths (the trusted
    t=1 kernel as oracle) — causal limits, GQA grouping, and masking."""
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    L, B, S, K, D, H, T = 2, 2, 64, 2, 16, 4, 5
    base = 37  # filled cache before the window
    ks_ = jax.random.split(jax.random.PRNGKey(11), 3)
    ck = jax.random.normal(ks_[0], (L, B, S, K, D), jnp.float32)
    cv = jax.random.normal(ks_[1], (L, B, S, K, D), jnp.float32)
    q = jax.random.normal(ks_[2], (B, T, H, D), jnp.float32)
    length = base + T

    got = decode_attention_stacked(
        q, ck, cv, jnp.asarray(1), jnp.asarray(length))
    assert got.shape == (B, T, H, D)
    for tq in range(T):
        ref = decode_attention_stacked(
            q[:, tq], ck, cv, jnp.asarray(1), jnp.asarray(base + tq + 1))
        np.testing.assert_allclose(
            np.asarray(got[:, tq]), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_stacked_window_quant_matches_per_position():
    from handsonvlm_tpu.models.llama import KVCache, quantize_kv_cache
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked_q

    L, B, S, K, D, H, T = 2, 1, 64, 2, 16, 4, 4
    base = 50
    ks_ = jax.random.split(jax.random.PRNGKey(12), 3)
    ck = jax.random.normal(ks_[0], (L, B, S, K, D), jnp.float32)
    cv = jax.random.normal(ks_[1], (L, B, S, K, D), jnp.float32)
    q = jax.random.normal(ks_[2], (B, T, H, D), jnp.float32)
    qc = quantize_kv_cache(KVCache(k=ck, v=cv, index=jnp.asarray(base)))

    got = decode_attention_stacked_q(
        q, qc.k, qc.v, qc.ks, qc.vs, jnp.asarray(0), jnp.asarray(base + T))
    for tq in range(T):
        ref = decode_attention_stacked_q(
            q[:, tq], qc.k, qc.v, qc.ks, qc.vs, jnp.asarray(0),
            jnp.asarray(base + tq + 1))
        np.testing.assert_allclose(
            np.asarray(got[:, tq]), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_stacked_window_key_mask():
    """key_mask composes with the window's causal limits."""
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    L, B, S, K, D, H, T = 1, 1, 32, 2, 8, 4, 3
    base = 20
    ks_ = jax.random.split(jax.random.PRNGKey(13), 3)
    ck = jax.random.normal(ks_[0], (L, B, S, K, D), jnp.float32)
    cv = jax.random.normal(ks_[1], (L, B, S, K, D), jnp.float32)
    q = jax.random.normal(ks_[2], (B, T, H, D), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[:, 5:9] = False  # left-pad style hole
    mask_j = jnp.asarray(mask)

    got = decode_attention_stacked(
        q, ck, cv, jnp.asarray(0), jnp.asarray(base + T), key_mask=mask_j)
    for tq in range(T):
        ref = decode_attention_stacked(
            q[:, tq], ck, cv, jnp.asarray(0), jnp.asarray(base + tq + 1),
            key_mask=mask_j)
        np.testing.assert_allclose(
            np.asarray(got[:, tq]), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_stacked_per_row_start_clamp():
    """Per-row block-sweep offsets (continuous batching / left padding): a
    row whose first valid key is deep into the cache must match the XLA
    reference exactly, per-row heterogeneous starts must not cross-talk,
    and an all-False row (idle continuous slot) must not poison others."""
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked

    q, ck, cv, mask, length = _setup_stacked(b=3, seed=6)
    m = np.array(mask)
    m[0, :0] = True            # row 0: full prefix valid
    m[1, :33] = False          # row 1: starts mid-cache (block-unaligned)
    m[2, :] = False            # row 2: idle slot, nothing valid
    m = jnp.asarray(m)
    ref = attention_xla(
        q, ck[1], cv[1], key_mask=m, causal=True, q_offset=length - 1)
    got = decode_attention_stacked(q, ck, cv, 1, length, key_mask=m, block_k=16)
    np.testing.assert_allclose(
        np.asarray(got[:2]), np.asarray(ref[:2]), atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got[2]), 0.0)  # skipped row


def test_stacked_quant_per_row_start_clamp():
    """Same per-row offsets through the int8 stacked-cache kernel."""
    from handsonvlm_tpu.models.llama import KVCache, quantize_kv_cache
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked_q

    rng = np.random.default_rng(9)
    L, B, S, K, D, H = 2, 2, 64, 2, 16, 4
    length = 48
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(L, B, S, K, D)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, B, S, K, D)), jnp.float32)
    qc = quantize_kv_cache(KVCache(k=ck, v=cv, index=jnp.asarray(length)))
    m = np.zeros((B, S), bool)
    m[0, :length] = True
    m[1, 21:length] = True  # late start
    m = jnp.asarray(m)
    deq_k = qc.k.astype(jnp.float32) * jnp.moveaxis(qc.ks, -1, 2)[..., None]
    deq_v = qc.v.astype(jnp.float32) * jnp.moveaxis(qc.vs, -1, 2)[..., None]
    ref = attention_xla(
        q, deq_k[1], deq_v[1], key_mask=m, causal=True, q_offset=length - 1)
    got = decode_attention_stacked_q(
        q, qc.k, qc.v, qc.ks, qc.vs, 1, length, key_mask=m, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)
