"""Int8 weight-only path: kernel accuracy, quantized llama decode."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import LlamaConfig
from handsonvlm_tpu.models.llama import KVCache, apply_llama, init_llama
from handsonvlm_tpu.ops.int8_matmul import (
    int8_matmul,
    maybe_int8_matmul,
    quantize_int8,
    quantize_llama,
)

CFG = LlamaConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, max_position_embeddings=64,
)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    w8, scale = quantize_int8(w)
    assert w8.dtype == jnp.int8 and scale.shape == (96,)
    got = np.asarray(int8_matmul(x, w8, scale))
    ref = np.asarray(x @ w)
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_maybe_int8_dispatch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
    dense = np.asarray(maybe_int8_matmul(x, w))
    w8, s = quantize_int8(w)
    quant = np.asarray(maybe_int8_matmul(x, {"w8": w8, "scale": s}))
    assert dense.shape == quant.shape == (2, 3, 48)
    rel = np.abs(dense - quant).mean() / np.abs(dense).mean()
    assert rel < 0.02


def test_quantized_llama_close_and_cached_decode_consistent():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    qparams = dict(params, llama=None)  # noqa: F841 (clarity)
    q = dict(params)
    q["layers"] = quantize_llama(params)["layers"]

    ids = jnp.asarray(np.arange(10)[None] % 100)
    ref, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla")
    got, _ = apply_llama(q, CFG, input_ids=ids, attn_impl="xla")
    rel = float(jnp.abs(got - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 0.05, rel  # quantization noise, not structural error

    # cached decode of the quantized model matches its own full forward
    cache = KVCache.create(CFG, 1, 16, jnp.float32)
    pre, cache = apply_llama(q, CFG, input_ids=ids[:, :6], kv_cache=cache, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(pre), np.asarray(got[:, :6]), atol=1e-5)
    step, cache = apply_llama(q, CFG, input_ids=ids[:, 6:7], kv_cache=cache, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(got[:, 6]), atol=1e-5)


def test_quantized_memory_halves():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    q = quantize_llama(params)

    def nbytes(tree, keys):
        total = 0
        for grp in ("attn", "mlp"):
            for leaf in jax.tree_util.tree_leaves(tree["layers"][grp]):
                total += leaf.size * leaf.dtype.itemsize
        return total

    dense = nbytes(params, None)
    quant = nbytes(q, None)
    assert quant < dense * 0.6  # int8 + small f32 scales vs f32/bf16
