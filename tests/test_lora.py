"""LoRA adapters: no-op init, activation-path == merged-weights, training."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from handsonvlm_tpu.core.config import LlamaConfig
from handsonvlm_tpu.models.llama import apply_llama, init_llama, lm_logits
from handsonvlm_tpu.models.lora import init_lora, merge_lora

CFG = LlamaConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, max_position_embeddings=64,
)


def test_lora_init_is_noop():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, r=4)
    ids = jnp.asarray(np.arange(10)[None] % 100)
    base, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla")
    with_lora, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla", lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_activation_path_matches_merged_weights():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, r=4)
    # give B nonzero values so the adapter does something
    lora["adapters"] = jax.tree_util.tree_map(
        lambda x: x + 0.01, lora["adapters"]
    )
    ids = jnp.asarray(np.arange(10)[None] % 100)
    adapted, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla", lora=lora)
    merged, _ = apply_llama(merge_lora(params, lora), CFG, input_ids=ids, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(merged), atol=1e-4)


def test_lora_training_moves_only_adapters():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, r=4)
    ids = jnp.asarray(np.arange(12)[None] % 100)
    labels = jnp.asarray((np.arange(12)[None] + 1) % 100)

    def loss_fn(lora):
        hidden, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla", lora=lora)
        logits = lm_logits(params, CFG, hidden)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, labels[..., None], -1).mean()

    tx = optax.adam(1e-2)
    opt = tx.init(lora)
    l0 = float(loss_fn(lora))
    for _ in range(5):
        grads = jax.grad(loss_fn)(lora)
        updates, opt = tx.update(grads, opt)
        lora = optax.apply_updates(lora, updates)
    assert float(loss_fn(lora)) < l0
    # base params untouched by construction (they were never updated)


def test_lora_with_kv_cache_decode():
    from handsonvlm_tpu.models.llama import KVCache

    params = init_llama(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, r=4)
    lora["adapters"] = jax.tree_util.tree_map(lambda x: x + 0.01, lora["adapters"])
    ids = jnp.asarray(np.arange(8)[None] % 100)
    full, _ = apply_llama(params, CFG, input_ids=ids, attn_impl="xla", lora=lora)
    cache = KVCache.create(CFG, 1, 16, jnp.float32)
    pre, cache = apply_llama(params, CFG, input_ids=ids[:, :5], kv_cache=cache, attn_impl="xla", lora=lora)
    step, cache = apply_llama(params, CFG, input_ids=ids[:, 5:6], kv_cache=cache, attn_impl="xla", lora=lora)
    np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, 5]), atol=1e-5)


def test_lora_grouped_matches_split():
    """Grouped shared-input adapter dots (lora_delta_multi "1"/"first")
    reproduce the split per-target default — values AND adapter grads —
    on both MHA (concat fast path) and GQA (tuple fallback: q/kv widths
    differ)."""
    import os

    configs = [CFG, LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2,
        max_position_embeddings=64)]
    for cfg in configs:
        params = init_llama(jax.random.PRNGKey(0), cfg)
        lora = init_lora(jax.random.PRNGKey(1), cfg, r=4)
        lora["adapters"] = jax.tree_util.tree_map(
            lambda x: x + 0.02, lora["adapters"])
        ids = jnp.asarray(np.arange(10)[None] % 100)
        labels = jnp.asarray((np.arange(10)[None] + 1) % 100)

        def loss_fn(lora):
            hidden, _ = apply_llama(
                params, cfg, input_ids=ids, attn_impl="xla", lora=lora)
            logits = lm_logits(params, cfg, hidden)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, labels[..., None], -1).mean()

        outs = {}
        for flag in ("1", "first", "0"):
            os.environ["HANDSONVLM_LORA_GROUPED"] = flag
            try:
                loss, grads = jax.value_and_grad(loss_fn)(lora)
            finally:
                os.environ.pop("HANDSONVLM_LORA_GROUPED", None)
            outs[flag] = (float(loss), grads)
        for flag in ("1", "first"):
            np.testing.assert_allclose(outs[flag][0], outs["0"][0], rtol=1e-6)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6),
                outs[flag][1], outs["0"][1])


def test_save_lora_remat_matches_full():
    """remat='save_lora' (full recompute + saved lora_u first-stage
    outputs) is a pure scheduling change: loss and adapter grads match
    remat='full' exactly."""
    params = init_llama(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, r=4)
    lora["adapters"] = jax.tree_util.tree_map(
        lambda x: x + 0.02, lora["adapters"])
    ids = jnp.asarray(np.arange(10)[None] % 100)
    labels = jnp.asarray((np.arange(10)[None] + 1) % 100)

    def make_loss(remat):
        def loss_fn(lora):
            hidden, _ = apply_llama(
                params, CFG, input_ids=ids, attn_impl="xla", lora=lora,
                remat=remat)
            logits = lm_logits(params, CFG, hidden)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(logp, labels[..., None], -1).mean()
        return loss_fn

    l_full, g_full = jax.value_and_grad(make_loss("full"))(lora)
    l_sl, g_sl = jax.value_and_grad(make_loss("save_lora"))(lora)
    np.testing.assert_allclose(float(l_sl), float(l_full), rtol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7),
        g_sl, g_full)


def test_lora_bf16_compute_close():
    """bf16 adapter compute (HANDSONVLM_LORA_BF16) tracks the f32 path
    within bf16 rounding on a bf16 activation stream; f32 activations are
    unaffected by the flag."""
    from handsonvlm_tpu.models import lora as lora_mod
    from handsonvlm_tpu.models.lora import init_lora, lora_delta

    cfg = CFG
    lora = init_lora(jax.random.PRNGKey(0), cfg, r=8, alpha=16.0)
    # make B nonzero so the delta isn't trivially 0
    lora["adapters"]["wq"]["b"] = (
        jax.random.normal(jax.random.PRNGKey(1),
                          lora["adapters"]["wq"]["b"].shape) * 0.05)
    layer0 = jax.tree_util.tree_map(lambda x: x[0], lora["adapters"])
    x32 = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.hidden_size))
    x16 = x32.astype(jnp.bfloat16)

    ref = lora_delta(layer0, "wq", x16, 2.0)
    old = lora_mod.LORA_COMPUTE_BF16
    try:
        lora_mod.LORA_COMPUTE_BF16 = True
        got16 = lora_delta(layer0, "wq", x16, 2.0)
        got32 = lora_delta(layer0, "wq", x32, 2.0)
    finally:
        lora_mod.LORA_COMPUTE_BF16 = old
    assert got16.dtype == jnp.bfloat16
    # same bf16 output grid; bf16 compute only reorders rounding
    err = float(jnp.max(jnp.abs(got16.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    ref_mag = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    assert err / ref_mag < 0.05, err / ref_mag
    # f32 stream ignores the flag (exact)
    np.testing.assert_array_equal(
        np.asarray(got32), np.asarray(lora_delta(layer0, "wq", x32, 2.0)))
