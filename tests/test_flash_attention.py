"""Pallas flash attention vs the XLA reference implementation.

Runs in interpreter mode on CPU; the same kernels compile on TPU (exercised
by bench.py / __graft_entry__).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.ops.attention import attention_xla
from handsonvlm_tpu.ops.flash_attention import flash_attention


def _qkv(b=1, t=40, s=None, h=2, d=32, seed=0):
    s = t if s is None else s
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, t, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_parity(causal):
    q, k, v = _qkv()
    ref = attention_xla(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_with_key_mask():
    q, k, v = _qkv(t=24)
    mask = np.ones((1, 24), bool)
    mask[0, 5:9] = False
    ref = attention_xla(q, k, v, key_mask=jnp.asarray(mask), causal=True)
    got = flash_attention(q, k, v, key_mask=jnp.asarray(mask), causal=True, block_q=8, block_k=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_q_offset_decode_shape():
    """Cached decode: 1 query attending to a 32-long cache at offset 20."""
    q, _, _ = _qkv(t=8)
    _, k, v = _qkv(t=8, s=32, seed=1)
    mask = np.zeros((1, 32), bool)
    mask[0, :21] = True  # cache holds 21 valid positions
    ref = attention_xla(q[:, :1], k, v, key_mask=jnp.asarray(mask), causal=True, q_offset=20)
    got = flash_attention(
        q[:, :1], k, v, key_mask=jnp.asarray(mask), causal=True, q_offset=20,
        block_q=8, block_k=8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_non_divisible_lengths():
    q, k, v = _qkv(t=37, s=37)
    ref = attention_xla(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_backward_parity(causal):
    q, k, v = _qkv(t=32, h=2, d=16, seed=2)

    def loss_ref(q, k, v):
        return (attention_xla(q, k, v, causal=causal) ** 2).sum()

    def loss_flash(q, k, v):
        return (
            flash_attention(q, k, v, causal=causal, block_q=16, block_k=16) ** 2
        ).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_got, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_backward_with_mask():
    q, k, v = _qkv(t=24, h=2, d=16, seed=3)
    mask = np.ones((1, 24), bool)
    mask[0, -6:] = False
    mask_j = jnp.asarray(mask)

    def loss_ref(q, k, v):
        return (attention_xla(q, k, v, key_mask=mask_j, causal=True) ** 2).sum()

    def loss_flash(q, k, v):
        return (
            flash_attention(q, k, v, key_mask=mask_j, causal=True, block_q=8, block_k=8) ** 2
        ).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_gqa_repeat():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 16, 4, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 16, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 16, 2, 16)).astype(np.float32))
    ref = attention_xla(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=8, block_k=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
