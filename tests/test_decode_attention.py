"""Pallas decode attention vs the XLA reference."""

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
