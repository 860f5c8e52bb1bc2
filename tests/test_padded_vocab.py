"""Padded-vocab sharding: embed/lm_head padded to a multiple so the vocab
dim shards under FSDP/TP (ROADMAP: 32101 replicates otherwise). The pad is
purely layout — logits of pad ids are -inf, numerics match the unpadded
model exactly.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.llama import apply_llama, init_llama, lm_logits
from handsonvlm_tpu.parallel.mesh import create_mesh
from handsonvlm_tpu.parallel.partition import shard_params

CFG = tiny_config().llama
PADDED = dataclasses.replace(CFG, pad_vocab_multiple=128)


def test_padded_shapes_and_mask():
    assert PADDED.padded_vocab_size == 32128
    params = init_llama(jax.random.PRNGKey(0), PADDED)
    assert params["embed"]["weight"].shape[0] == 32128
    assert params["lm_head"]["weight"].shape[1] == 32128
    ids = jnp.asarray([[1, 5, 32100]])
    hidden, _ = apply_llama(params, PADDED, input_ids=ids, attn_impl="xla")
    logits = lm_logits(params, PADDED, hidden)
    assert logits.shape[-1] == 32128
    assert bool(jnp.isinf(logits[..., 32101:]).all())
    assert bool(jnp.isfinite(logits[..., :32101]).all())


def test_padded_matches_unpadded_numerics():
    """Same weights, padded layout vs not: logits and softmax identical."""
    params = init_llama(jax.random.PRNGKey(0), CFG)
    padded = dict(params)
    padded["embed"] = {"weight": jnp.pad(params["embed"]["weight"], ((0, 27), (0, 0)))}
    padded["lm_head"] = {"weight": jnp.pad(params["lm_head"]["weight"], ((0, 0), (0, 27)))}
    ids = jnp.asarray([[1, 7, 300, 32099]])
    h_ref, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla")
    h_pad, _ = apply_llama(padded, PADDED, input_ids=ids, attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_pad))
    l_ref = lm_logits(params, CFG, h_ref)
    l_pad = lm_logits(padded, PADDED, h_pad)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_pad[..., :32101]))
    p_ref = jax.nn.softmax(l_ref, axis=-1)
    p_pad = jax.nn.softmax(l_pad, axis=-1)
    np.testing.assert_allclose(
        np.asarray(p_ref), np.asarray(p_pad[..., :32101]), atol=1e-7
    )
    assert float(p_pad[..., 32101:].sum()) == 0.0


def test_sampling_never_picks_pad_ids():
    params = init_llama(jax.random.PRNGKey(0), PADDED)
    hidden, _ = apply_llama(
        params, PADDED, input_ids=jnp.asarray([[1, 2, 3]]), attn_impl="xla"
    )
    logits = lm_logits(params, PADDED, hidden)[:, -1]
    for seed in range(50):
        tok = jax.random.categorical(jax.random.PRNGKey(seed), logits, axis=-1)
        assert int(tok[0]) < 32101


def test_padded_embed_shards_on_mesh():
    mesh = create_mesh(data=8, model=1)
    params = {"llama": init_llama(jax.random.PRNGKey(0), PADDED)}
    sharded = shard_params(params, mesh)
    spec = sharded["llama"]["embed"]["weight"].sharding.spec
    assert spec[0] == "data"  # 32128 % 8 == 0 -> actually sharded now
    spec = sharded["llama"]["lm_head"]["weight"].sharding.spec
    assert spec == ("data", "model") or spec[0] == "data"


def test_converter_pad_and_export_roundtrip():
    from handsonvlm_tpu.convert.hf_to_jax import convert_llama
    from handsonvlm_tpu.convert.jax_to_hf import export_llama

    rng = np.random.default_rng(0)
    d, v = CFG.hidden_size, CFG.vocab_size
    sd = {"model.embed_tokens.weight": rng.standard_normal((v, d), np.float32),
          "model.norm.weight": np.ones((d,), np.float32),
          "lm_head.weight": rng.standard_normal((v, d), np.float32)}
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        for k, shape in (("self_attn.q_proj", (d, d)), ("self_attn.k_proj", (d, d)),
                         ("self_attn.v_proj", (d, d)), ("self_attn.o_proj", (d, d)),
                         ("mlp.gate_proj", (CFG.intermediate_size, d)),
                         ("mlp.up_proj", (CFG.intermediate_size, d)),
                         ("mlp.down_proj", (d, CFG.intermediate_size))):
            sd[p + k + ".weight"] = rng.standard_normal(shape, np.float32)
        sd[p + "input_layernorm.weight"] = np.ones((d,), np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones((d,), np.float32)

    params = convert_llama(sd, PADDED)
    assert params["embed"]["weight"].shape[0] == 32128
    np.testing.assert_array_equal(
        np.asarray(params["embed"]["weight"][32101:]), 0.0
    )
    out = export_llama(params, vocab_size=PADDED.vocab_size)
    np.testing.assert_allclose(
        out["model.embed_tokens.weight"], sd["model.embed_tokens.weight"], rtol=1e-6
    )
    np.testing.assert_allclose(out["lm_head.weight"], sd["lm_head.weight"], rtol=1e-6)
