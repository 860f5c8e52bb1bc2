"""Numerical parity of the JAX LLaMA decoder vs HF transformers (torch CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import LlamaConfig
from handsonvlm_tpu.models.llama import KVCache, apply_llama, init_llama, lm_logits
from handsonvlm_tpu.convert.hf_to_jax import convert_llama

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=4,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def hf_and_jax():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    params = convert_llama(hf.state_dict(), CFG)
    return hf, params


def test_logits_parity(hf_and_jax):
    hf, params = hf_and_jax
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    hidden, _ = apply_llama(params, CFG, input_ids=jnp.asarray(ids), attn_impl="xla")
    got = np.asarray(lm_logits(params, CFG, hidden))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_padding_mask_parity(hf_and_jax):
    hf, params = hf_and_jax
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[0, :3] = 0  # left padding
    # HF computes positions from the cumulative mask
    positions = np.maximum(mask.cumsum(-1) - 1, 0)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    hidden, _ = apply_llama(
        params,
        CFG,
        input_ids=jnp.asarray(ids),
        attn_mask=jnp.asarray(mask),
        positions=jnp.asarray(positions),
        attn_impl="xla",
    )
    got = np.asarray(lm_logits(params, CFG, hidden))
    # only compare non-pad positions
    np.testing.assert_allclose(got[:, 3:], ref[:, 3:], atol=2e-4, rtol=2e-3)


def test_kv_cache_decode_matches_full_forward(hf_and_jax):
    _, params = hf_and_jax
    rng = np.random.default_rng(2)
    T = 10
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, T)))

    # full forward
    hidden_full, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla")

    # prefill 6, then decode 4 one at a time
    cache = KVCache.create(CFG, batch=1, max_len=32, dtype=jnp.float32)
    hidden_pre, cache = apply_llama(
        params, CFG, input_ids=ids[:, :6], kv_cache=cache, attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(hidden_pre), np.asarray(hidden_full[:, :6]), atol=1e-5
    )
    steps = []
    for i in range(6, T):
        h, cache = apply_llama(
            params, CFG, input_ids=ids[:, i : i + 1], kv_cache=cache, attn_impl="xla"
        )
        steps.append(np.asarray(h)[:, 0])
    got = np.stack(steps, axis=1)
    np.testing.assert_allclose(got, np.asarray(hidden_full[:, 6:]), atol=1e-5)
    assert int(cache.index) == T


def test_remat_matches(hf_and_jax):
    _, params = hf_and_jax
    ids = jnp.asarray(np.arange(8)[None, :] % CFG.vocab_size)
    h1, _ = apply_llama(params, CFG, input_ids=ids, remat=False, attn_impl="xla")
    h2, _ = apply_llama(params, CFG, input_ids=ids, remat=True, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_init_shapes():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    assert params["embed"]["weight"].shape == (128, 32)
    assert params["layers"]["attn"]["wq"].shape == (2, 32, 32)
    assert params["lm_head"]["weight"].shape == (32, 128)


def test_stacked_decode_matches_carry_modes():
    """The decode fast path (stacked carry + scalar-prefetch layer attention,
    cache_scan_mode='auto'/'stacked') is bit-compatible with the slower
    'carry' and 'ys' modes, with left-pad masks and LoRA attached."""
    from handsonvlm_tpu.models.lora import init_lora

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=3,
        num_heads=4, num_kv_heads=2, max_position_embeddings=64,
    )
    params = init_llama(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params_lora = dict(params)
    lora = init_lora(jax.random.PRNGKey(1), cfg, r=2, alpha=4.0)
    lora["adapters"] = jax.tree_util.tree_map(
        lambda x: x + 0.1 if x.ndim == 3 else x, lora["adapters"]
    )

    b, t0, s_max = 2, 5, 24
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, t0), 0, 64)
    attn = np.ones((b, s_max), bool)
    attn[0, :2] = False  # row 0 left-padded
    attn = jnp.asarray(attn)

    for use_lora in (False, True):
        lo = lora if use_lora else None
        cache = KVCache.create(cfg, batch=b, max_len=s_max, dtype=jnp.float32)
        _, cache = apply_llama(
            params, cfg, input_ids=ids, kv_cache=cache, attn_impl="xla",
            attn_mask=attn, lora=lo,
        )
        for t_step in (1, 5):  # decode and speculative-verify windows
            step = jax.random.randint(jax.random.PRNGKey(3), (b, t_step), 0, 64)
            outs = {}
            for mode in ("stacked", "carry", "ys"):
                h, c2 = apply_llama(
                    params, cfg, input_ids=step, kv_cache=cache, attn_mask=attn,
                    cache_scan_mode=mode, lora=lo,
                )
                outs[mode] = (np.asarray(h), np.asarray(c2.k), np.asarray(c2.v))
            for mode in ("carry", "ys"):
                np.testing.assert_allclose(outs["stacked"][0], outs[mode][0], atol=1e-5, rtol=1e-4)
                np.testing.assert_allclose(outs["stacked"][1], outs[mode][1], atol=1e-6)
                np.testing.assert_allclose(outs["stacked"][2], outs[mode][2], atol=1e-6)
