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


def test_int4_matmul_accuracy():
    """Group-wise int4 dequant matmul: ~4-bit relative error bound."""
    from handsonvlm_tpu.ops.int8_matmul import int4_matmul, quantize_int4

    rng = np.random.default_rng(0)
    d, n = 256, 192
    w = rng.standard_normal((d, n)).astype(np.float32) * 0.05
    x = rng.standard_normal((3, d)).astype(np.float32)
    q = quantize_int4(jnp.asarray(w))
    assert q["w4"].shape == (d // 128, 64, n)  # nibble-packed pairs
    assert q["w4"].dtype == jnp.int8
    y = np.asarray(int4_matmul(jnp.asarray(x), q["w4"], q["gscale"]))
    ref = x @ w
    rel = np.abs(y - ref).mean() / np.abs(ref).mean()
    assert rel < 0.2, rel  # 4-bit with group-128 scales (random gaussian worst-ish case)
    # int4 should be meaningfully tighter than a no-scale straw man and
    # looser than int8
    from handsonvlm_tpu.ops.int8_matmul import quantize_int8

    w8, s8 = quantize_int8(jnp.asarray(w))
    y8 = np.asarray((jnp.asarray(x) @ w8.astype(jnp.float32)) * s8)
    rel8 = np.abs(y8 - ref).mean() / np.abs(ref).mean()
    assert rel8 < rel


def test_int4_full_model_decode():
    """Greedy int4 decode runs end-to-end and stays close to bf16."""
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.infer.sampler import generate_chunked

    params, cfg, tok = load_pretrained_model("random:tiny", "tiny", quantize="int4")
    leaf = params["llama"]["layers"]["int4"]["wqkv"]  # fused stacked leaves
    assert "w4t" in leaf and leaf["w4t"].dtype == jnp.int8  # nibble-packed
    # (L, NB, G, g/2, BN) tiled layout: contiguous per-block weight DMA
    assert leaf["w4t"].ndim == 5
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 1000, size=(1, 10)); ids[0, 1] = -200
    images = rng.normal(size=(1, cfg.num_frames, 3, cfg.vision.image_size,
                              cfg.vision.image_size)).astype(np.float32)
    out = generate_chunked(params, cfg, ids, images, jax.random.PRNGKey(0),
                           max_new_tokens=6, temperature=0.0, attn_impl="xla", chunk=3)
    assert int(out.num_tokens[0]) >= 1
    assert np.asarray(out.sequences).shape == (1, 6)


def test_int4_prefill_kernel_accuracy():
    """The prefill-specialized dequant-to-bf16 kernel tracks the EXACT
    f32 dequant matmul to bf16 tolerance (~0.3%) across layers, m sizes,
    and a non-multiple m that exercises padding. (The decode kernel's
    biased-nibble bf16 algebra sits ~2.7% from exact on the same inputs —
    the prefill path is the *tighter* of the two.)"""
    from handsonvlm_tpu.ops.int8_matmul import (
        _unpack_int4, int4_matmul_prefill, quantize_int4,
    )

    rng = np.random.default_rng(1)
    L, d, n = 3, 512, 384
    qs, exact = [], []
    for i in range(L):
        w = rng.standard_normal((d, n)).astype(np.float32) * 0.05
        q = quantize_int4(jnp.asarray(w))
        qs.append(q)
        wdq = np.asarray(_unpack_int4(q["w4"], jnp.float32))
        exact.append((wdq * np.asarray(q["gscale"])[:, None, :]).reshape(d, n))
    w4_all = jnp.stack([q["w4"] for q in qs])
    gs_all = jnp.stack([q["gscale"] for q in qs])
    for m in (8, 100, 256):
        x = np.asarray(rng.standard_normal((m, d)), np.float32) * 0.3
        for layer in (0, L - 1):
            ref = x @ exact[layer]
            got = np.asarray(int4_matmul_prefill(jnp.asarray(x), w4_all, gs_all, layer))
            rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
            assert rel < 6e-3, (m, layer, rel)


def test_int4_stacked_custom_vjp():
    """QLoRA backward: d/dx of int4_matmul_stacked is dy @ dequant(W)^T
    (int4_matmul_stacked_T kernel); quantized leaves get zero/float0
    cotangents so a frozen int4 base never blocks jax.grad."""
    import jax

    from handsonvlm_tpu.ops.int8_matmul import (
        _unpack_int4, int4_matmul_stacked, quantize_int4,
    )

    rng = np.random.default_rng(2)
    L, d, n = 2, 256, 384
    qs, exact = [], []
    for _ in range(L):
        w = rng.standard_normal((d, n)).astype(np.float32) * 0.05
        q = quantize_int4(jnp.asarray(w))
        qs.append(q)
        wdq = np.asarray(_unpack_int4(q["w4"], jnp.float32))
        exact.append((wdq * np.asarray(q["gscale"])[:, None, :]).reshape(d, n))
    w4_all = jnp.stack([q["w4"] for q in qs])
    gs_all = jnp.stack([q["gscale"] for q in qs])

    for m in (4, 200):  # GEMV and prefill forward dispatches share the VJP
        x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
        for layer in (0, 1):
            g = jax.grad(
                lambda x_: (int4_matmul_stacked(x_, w4_all, gs_all, layer) * v).sum()
            )(x)
            ref = np.asarray(v) @ exact[layer].T
            rel = np.abs(np.asarray(g) - ref).mean() / np.abs(ref).mean()
            assert rel < 1e-2, (m, layer, rel)

    # grads flow through a composition and quantized leaves stay frozen
    def loss(x_, w4_, gs_):
        y = int4_matmul_stacked(x_, w4_, gs_, 0)
        return (y**2).sum()

    x = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    gx, ggs = jax.grad(loss, argnums=(0, 2))(x, w4_all, gs_all)
    assert gx.shape == x.shape and float(jnp.abs(gx).sum()) > 0
    assert float(jnp.abs(ggs).sum()) == 0.0


def test_int8_lm_head_logits_close():
    """quantize_lm_head: per-column int8 head matches bf16 logits closely
    and is idempotent; lm_logits dispatches on the leaf structure."""
    from handsonvlm_tpu.models.llama import lm_logits
    from handsonvlm_tpu.ops.int8_matmul import quantize_lm_head

    params = init_llama(jax.random.PRNGKey(0), CFG)
    q = quantize_lm_head(dict(params))
    assert "w8" in q["lm_head"] and q["lm_head"]["w8"].dtype == jnp.int8
    assert quantize_lm_head(q)["lm_head"] is q["lm_head"]  # idempotent

    h = jax.random.normal(jax.random.PRNGKey(1), (1, 3, CFG.hidden_size))
    ref = np.asarray(lm_logits(params, CFG, h))
    got = np.asarray(lm_logits(q, CFG, h))
    assert ref.shape == got.shape
    m = np.isfinite(ref)
    rel = np.abs(got[m] - ref[m]).mean() / (np.abs(ref[m]).mean() + 1e-9)
    assert rel < 0.02, rel


def test_quantized_inits_emit_int8_lm_head():
    from handsonvlm_tpu.ops.int8_matmul import (
        init_llama_int4,
        init_llama_int8,
        quantize_llama_int4,
    )

    p8 = init_llama_int8(jax.random.PRNGKey(0), CFG)
    p4 = init_llama_int4(jax.random.PRNGKey(0), CFG)
    assert "w8" in p8["lm_head"] and "w8" in p4["lm_head"]
    dense = init_llama(jax.random.PRNGKey(0), CFG)
    assert "w8" in quantize_llama(dense)["lm_head"]
    assert "w8" in quantize_llama_int4(dense)["lm_head"]


def test_int4_tiled_layout_parity():
    """tile_int4_stacked: tiled GEMV / prefill / transpose all match the
    flat-layout kernels (which match exact dequant; tests above)."""
    import jax
    import jax.numpy as jnp

    from handsonvlm_tpu.ops.int8_matmul import (
        int4_matmul_stacked,
        int4_matmul_stacked_T,
        quantize_int4,
        tile_int4_stacked,
    )

    rng = np.random.default_rng(0)
    L, d, n = 2, 64, 64
    w = rng.normal(size=(L, d, n)).astype(np.float32) * 0.05
    qs = [quantize_int4(jnp.asarray(w[i]), group=32) for i in range(L)]
    w4 = jnp.stack([q["w4"] for q in qs])
    gs = jnp.stack([q["gscale"] for q in qs])
    tiled = tile_int4_stacked(w4, gs, block_n=16)
    assert tiled["w4t"].shape == (L, 4, 2, 16, 16)  # (L, NB, G, g/2, BN)

    for m in (2, 200):  # GEMV path and the prefill (m>=128) path
        x = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
        for li in range(L):
            ref = int4_matmul_stacked(x, w4, gs, jnp.int32(li))
            got = int4_matmul_stacked(
                x, tiled["w4t"], tiled["gst"], jnp.int32(li)
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-2, atol=1e-4
            )

    # transpose (QLoRA dx) parity
    dy = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
    ref = int4_matmul_stacked_T(dy, w4, gs, jnp.int32(1))
    got = int4_matmul_stacked_T(dy, tiled["w4t"], tiled["gst"], jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=1e-4)


def test_int4_tiled_custom_vjp_grad_flows():
    """jax.grad through the tiled layout (QLoRA backward path)."""
    import jax
    import jax.numpy as jnp

    from handsonvlm_tpu.ops.int8_matmul import (
        int4_matmul_stacked,
        quantize_int4,
        tile_int4_stacked,
    )

    rng = np.random.default_rng(1)
    w = rng.normal(size=(1, 32, 32)).astype(np.float32) * 0.05
    q = quantize_int4(jnp.asarray(w[0]), group=16)
    tiled = tile_int4_stacked(q["w4"][None], q["gscale"][None], block_n=16)

    def f(x):
        return int4_matmul_stacked(
            x, tiled["w4t"], tiled["gst"], jnp.int32(0)
        ).sum()

    g = jax.grad(f)(jnp.asarray(rng.normal(size=(2, 32)), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).sum()) > 0


def test_prefill4_blocks_respect_vmem_budget():
    """Every prefill block choice stays under the scoped-VMEM budget, and
    the measured-green tuned shapes keep their full-d contraction tile.

    Regression for the B=4 train-step compile failure (2026-08-18): the
    balanced m-split chose block_m=456 with block_k=4096 at m=2736 and the
    remote compiler died with 'scoped allocation 16.66M > 16M'."""
    from handsonvlm_tpu.ops.int8_matmul import (
        _PREFILL4_VMEM_BUDGET,
        _prefill4_blocks,
        _prefill4_vmem_est,
    )

    group = 128
    # 7B (d=4096) and 13B (d=5120 gate/up, d=13824 down-proj) contractions:
    # every choice must divide d AND stay a multiple of group — plain
    # halving broke this at d=13824 (1728 = 13.5 * 128)
    for d in (4096, 5120, 13824):
        for m in (8, 200, 398, 512, 684, 751, 1368, 2048, 2736, 8192):
            for n in (4096, 5120, 11008, 12288, 13824, 15360, 22016):
                bm, bn, bk = _prefill4_blocks(m, d, n, group)
                est = _prefill4_vmem_est(bm, bn, bk, group)
                assert est <= _PREFILL4_VMEM_BUDGET, (d, m, n, bm, bn, bk, est)
                assert bk % group == 0 and d % bk == 0, (d, m, n, bk)
    # tuned single-sample shapes keep the full-d tile (perf contract:
    # 37.5 ms eval-prefill chain / 44.9% MFU B=1 train were measured there)
    for m in (398, 684, 751):
        assert _prefill4_blocks(m, 4096, 12288, group)[2] == 4096, m
    # the B=4 train shape: under the tuned bn=256 default the full-d tile
    # fits the budget (narrower n-tile shrinks the dequant temp) — no
    # shedding needed; under the old bn=512 the guard must still shed bk
    # instead of dying at compile (the original regression)
    import handsonvlm_tpu.ops.int8_matmul as im

    bm, bn, bk = _prefill4_blocks(2736, 4096, 12288, group)
    assert _prefill4_vmem_est(bm, bn, bk, group) <= _PREFILL4_VMEM_BUDGET
    old_bn = im.PREFILL4_BLOCK_N
    try:
        im.PREFILL4_BLOCK_N = 512
        bm, bn, bk = _prefill4_blocks(2736, 4096, 12288, group)
        assert bk < 4096
        assert _prefill4_vmem_est(bm, bn, bk, group) <= _PREFILL4_VMEM_BUDGET
    finally:
        im.PREFILL4_BLOCK_N = old_bn
