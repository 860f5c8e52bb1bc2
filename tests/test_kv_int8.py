"""int8 KV cache: kernel dequant parity, cached-forward parity, e2e decode.

Beyond-reference capability (the reference has no KV cache at all): the
stacked decode cache stores int8 values + per-(token, head) scales,
halving the dominant decode-attention DMA and the cache footprint
(ops/decode_attention.decode_attention_stacked_q, models/llama.QuantKVCache).
"""

import jax
import jax.numpy as jnp
import numpy as np

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.models.llama import (
    KVCache,
    apply_llama,
    quantize_kv_cache,
)
from handsonvlm_tpu.ops.decode_attention import (
    decode_attention_stacked,
    decode_attention_stacked_q,
)

CFG = tiny_config()


def test_kernel_dequant_parity():
    """int8-cache kernel vs bf16-cache kernel on the SAME (quantized)
    values: dequantization in-kernel must be exact, so feeding the
    dequantized bf16 cache to the bf16 kernel gives the same output."""
    L, B, S, K, D, H = 3, 2, 64, 2, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    ck = jax.random.normal(ks[1], (L, B, S, K, D), jnp.float32)
    cv = jax.random.normal(ks[2], (L, B, S, K, D), jnp.float32)

    cache = KVCache(k=ck, v=cv, index=jnp.asarray(40, jnp.int32))
    qc = quantize_kv_cache(cache)
    # dequantized reference cache
    deq = lambda x8, sc: x8.astype(jnp.float32) * jnp.transpose(
        sc, (0, 1, 3, 2))[..., None]
    ck_d = deq(qc.k, qc.ks)
    cv_d = deq(qc.v, qc.vs)

    for li in (0, 2):
        ref = decode_attention_stacked(
            q, ck_d, cv_d, jnp.asarray(li), jnp.asarray(41))
        out = decode_attention_stacked_q(
            q, qc.k, qc.v, qc.ks, qc.vs, jnp.asarray(li), jnp.asarray(41))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_cached_forward_close_to_bf16():
    """apply_llama decode step over a quantized cache tracks the bf16 cache
    within int8-quantization tolerance."""
    from handsonvlm_tpu.models.llama import init_llama

    cfg = CFG.llama
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, S = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, cfg.hidden_size),
                          jnp.float32)
    # fill a cache with a short prefill
    pre = jax.random.normal(jax.random.PRNGKey(2), (B, 5, cfg.hidden_size),
                            jnp.float32)
    cache = KVCache.create(cfg, B, S, jnp.float32)
    _, cache = apply_llama(params, cfg, inputs_embeds=pre, kv_cache=cache)

    h_ref, _ = apply_llama(params, cfg, inputs_embeds=x, kv_cache=cache)
    h_q, qcache2 = apply_llama(params, cfg, inputs_embeds=x,
                               kv_cache=quantize_kv_cache(cache))
    assert int(qcache2.index) == int(cache.index) + 1
    err = float(jnp.abs(h_q - h_ref).max() / (jnp.abs(h_ref).max() + 1e-9))
    assert err < 0.05, err  # int8 KV error bound

    # t=5 verify window (XLA dequant fallback path)
    w = jax.random.normal(jax.random.PRNGKey(3), (B, 5, cfg.hidden_size),
                          jnp.float32)
    h_ref5, _ = apply_llama(params, cfg, inputs_embeds=w, kv_cache=cache)
    h_q5, _ = apply_llama(params, cfg, inputs_embeds=w,
                          kv_cache=quantize_kv_cache(cache))
    err5 = float(jnp.abs(h_q5 - h_ref5).max() / (jnp.abs(h_ref5).max() + 1e-9))
    assert err5 < 0.05, err5


def test_generate_chunked_kv_int8_e2e():
    from handsonvlm_tpu.infer.sampler import generate_chunked

    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)

    kwargs = dict(max_new_tokens=8, temperature=0.0, attn_impl="xla", chunk=4)
    ref = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7),
                           **kwargs)
    out = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7),
                           kv_quant="int8", **kwargs)
    assert out.sequences.shape == ref.sequences.shape
    assert int(out.num_tokens[0]) >= 1
    assert np.isfinite(np.asarray(out.pred_hands)).all()
    # greedy rollouts from the same weights usually agree; require at least
    # the first token to match (logit gaps at step 0 far exceed int8 noise)
    assert int(out.sequences[0, 0]) == int(ref.sequences[0, 0])


def test_kv_int8_tp_sharded():
    """Quant kernel composed with the model-axis mesh: head-sharded int8
    cache + scales match the unsharded kernel on the simulated mesh."""
    from jax.sharding import Mesh
    from handsonvlm_tpu.parallel.tp import decode_attention_stacked_q_tp

    L, B, S, K, D, H = 2, 2, 64, 4, 16, 8
    ks_ = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks_[0], (B, H, D), jnp.float32)
    ck = jax.random.normal(ks_[1], (L, B, S, K, D), jnp.float32)
    cv = jax.random.normal(ks_[2], (L, B, S, K, D), jnp.float32)
    qc = quantize_kv_cache(KVCache(k=ck, v=cv, index=jnp.asarray(50, jnp.int32)))

    ref = decode_attention_stacked_q(
        q, qc.k, qc.v, qc.ks, qc.vs, jnp.asarray(1), jnp.asarray(51))
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "model"))
    out = decode_attention_stacked_q_tp(
        q, qc.k, qc.v, qc.ks, qc.vs, jnp.asarray(1), jnp.asarray(51),
        mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_engine_kv_int8():
    """InferenceEngine(kv_quant='int8') — the eval/serve wiring end-to-end
    (batched generate_chunked path with frame dedup)."""
    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.eval.evaluator import InferenceEngine

    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    eng = InferenceEngine(
        params=params, cfg=CFG, tokenizer=MockTokenizer(),
        max_new_tokens=6, temperature=0.0, kv_quant="int8",
    )
    rng_np = np.random.default_rng(0)
    frames = rng_np.normal(size=(
        CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)
    pred, valid, gen = eng.infer(
        "where next?", frames[None], jax.random.PRNGKey(1))
    assert pred.shape == (1, 2, 4, 2) and np.isfinite(pred).all()


def test_generate_spec_kv_int8():
    """spec x kv8: the speculative loop must thread the QuantKVCache type
    through its lax.cond carry (round-2 regression: _active_body rebuilt a
    plain KVCache, dropping ks/vs and crashing tracing with mismatched cond
    branch pytrees). Greedy spec over the int8 cache matches greedy
    sequential over the int8 cache token-for-token."""
    from handsonvlm_tpu.infer.sampler import generate_chunked
    from handsonvlm_tpu.infer.speculative import generate_spec

    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)

    kwargs = dict(max_new_tokens=10, temperature=0.0, attn_impl="xla",
                  kv_quant="int8")
    ref = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7),
                           chunk=4, **kwargs)
    out, stats = generate_spec(params, CFG, ids, images, jax.random.PRNGKey(7),
                               k=3, chunk_iters=4, **kwargs)
    n = int(ref.num_tokens[0])
    assert int(out.num_tokens[0]) == n, (int(out.num_tokens[0]), n)
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, :n]), np.asarray(ref.sequences[0, :n]))
    assert int(out.num_hands[0]) == int(ref.num_hands[0])
    assert stats["iters"] >= 1


def test_generate_host_kv_int8():
    """chat path (--kv-int8): host-driven per-token decode over the
    quantized cache."""
    from handsonvlm_tpu.infer.sampler import generate_host

    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(size=(
        1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size
    )).astype(np.float32)
    out = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7),
                        max_new_tokens=6, temperature=0.0, attn_impl="xla",
                        kv_quant="int8")
    assert int(out.num_tokens[0]) >= 1
    assert np.isfinite(np.asarray(out.pred_hands)).all()
