"""Fused int8-base + LoRA-epilogue stacked kernels (ops/qlora_fused).

Oracle: the unfused training path — `maybe_int8_matmul` (XLA fused-upcast
int8 dot) + `models/lora.lora_delta` (f32 adapter dots) — whose numerics the
fused kernels must reproduce within bf16 accumulation tolerance, forward AND
backward (custom VJP). Plus an end-to-end apply_llama A/B: the stacked tree
(layers['int8'], scan constants) vs the per-leaf tree (scan xs, XLA dots)
must agree on logits and on LoRA adapter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handsonvlm_tpu.ops.int8_matmul import maybe_int8_matmul, quantize_stacked_int8
from handsonvlm_tpu.ops.qlora_fused import (
    int8_lora_matmul_stacked,
    int8_matmul_stacked,
    stack_llama_int8,
)

L, D, N, R = 3, 256, 384, 128


def _mk(seed=0, r=R, m=20, d=D, n=N):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(L, d, n)) * 0.02, jnp.float32)
    leaf = quantize_stacked_int8(w)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.bfloat16)
    a = jnp.asarray(rng.normal(size=(d, r)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(r, n)) * 0.1, jnp.float32)
    ls = jnp.asarray(2.0, jnp.float32)
    return leaf, x, a, b, ls


def _ref_base(x, leaf, l):
    wl = {"w8": leaf["w8"][l], "scale": leaf["scale"][l]}
    return maybe_int8_matmul(x, wl)


def _ref_fused(x, leaf, a, b, ls, l):
    base = _ref_base(x, leaf, l)
    delta = ((x @ a) @ b) * ls  # f32 adapter path (models/lora.lora_delta)
    return base + delta.astype(x.dtype)


def test_base_forward_matches_xla_path():
    leaf, x, *_ = _mk()
    for l in range(L):
        got = int8_matmul_stacked(x, leaf["w8"], leaf["scale"], l)
        ref = _ref_base(x, leaf, l)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=2e-2 * float(jnp.abs(ref).max()))


def test_fused_forward_matches_unfused():
    leaf, x, a, b, ls = _mk()
    got = int8_lora_matmul_stacked(x, leaf["w8"], leaf["scale"], a, b, ls, 1)
    ref = _ref_fused(x, leaf, a, b, ls, 1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2 * float(jnp.abs(ref).max()))


def test_fused_forward_small_rank_padding():
    # r=8 exercises the pad-rank-to-128 path (zero rows/cols are no-ops)
    leaf, x, a, b, ls = _mk(seed=3, r=8)
    got = int8_lora_matmul_stacked(x, leaf["w8"], leaf["scale"], a, b, ls, 2)
    ref = _ref_fused(x, leaf, a, b, ls, 2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2 * float(jnp.abs(ref).max()))


def test_fused_grads_match_unfused():
    leaf, x, a, b, ls = _mk(seed=1)
    probe = jnp.asarray(
        np.random.default_rng(9).normal(size=(x.shape[0], N)), jnp.float32)

    def loss_fused(x, a, b):
        y = int8_lora_matmul_stacked(x, leaf["w8"], leaf["scale"], a, b, ls, 0)
        return jnp.sum(y.astype(jnp.float32) * probe)

    def loss_ref(x, a, b):
        return jnp.sum(_ref_fused(x, leaf, a, b, ls, 0).astype(jnp.float32)
                       * probe)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a, b)
    for got, ref, tol in zip(gf, gr, (4e-2, 2e-2, 2e-2)):
        scale = float(jnp.abs(ref).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=tol * scale)


def test_base_grad_dx_matches():
    leaf, x, *_ = _mk(seed=2)
    probe = jnp.asarray(
        np.random.default_rng(5).normal(size=(x.shape[0], N)), jnp.float32)

    def loss_k(x):
        y = int8_matmul_stacked(x, leaf["w8"], leaf["scale"], 2)
        return jnp.sum(y.astype(jnp.float32) * probe)

    def loss_r(x):
        return jnp.sum(_ref_base(x, leaf, 2).astype(jnp.float32) * probe)

    gk = jax.grad(loss_k)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(
        np.asarray(gk, np.float32), np.asarray(gr, np.float32),
        rtol=0, atol=4e-2 * float(jnp.abs(gr).max()))


@pytest.fixture(scope="module")
def tiny_llama():
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.llama import init_llama
    from handsonvlm_tpu.ops.int8_matmul import quantize_llama

    cfg = tiny_config().llama
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    q = quantize_llama(params)
    return cfg, q


def test_apply_llama_stacked_matches_leaf_tree(tiny_llama):
    from handsonvlm_tpu.models.llama import apply_llama
    from handsonvlm_tpu.models.lora import init_lora

    cfg, q = tiny_llama
    stacked = stack_llama_int8(q)
    lora = init_lora(jax.random.PRNGKey(1), cfg, r=8, alpha=16.0)
    # non-zero B so the adapter path actually contributes
    lora["adapters"] = jax.tree_util.tree_map(
        lambda v: v + 0.01, lora["adapters"])
    ids = jnp.asarray(np.random.default_rng(0).integers(
        3, cfg.vocab_size, size=(2, 16)))

    def logits(tree):
        h, _ = apply_llama(tree, cfg, input_ids=ids, lora=lora)
        return h

    ref = logits(q)
    got = logits(stacked)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=3e-2 * float(jnp.abs(ref).max()))


def test_apply_llama_stacked_lora_grads(tiny_llama):
    from handsonvlm_tpu.models.llama import apply_llama
    from handsonvlm_tpu.models.lora import init_lora

    cfg, q = tiny_llama
    stacked = stack_llama_int8(q)
    lora = init_lora(jax.random.PRNGKey(1), cfg, r=8, alpha=16.0)
    lora["adapters"] = jax.tree_util.tree_map(
        lambda v: v + 0.01, lora["adapters"])
    ids = jnp.asarray(np.random.default_rng(0).integers(
        3, cfg.vocab_size, size=(1, 12)))

    def loss(lo, tree):
        h, _ = apply_llama(tree, cfg, input_ids=ids, lora=lo, remat="full")
        return jnp.sum(h.astype(jnp.float32) ** 2)

    gr = jax.grad(loss)(lora, q)["adapters"]
    gs = jax.grad(loss)(lora, stacked)["adapters"]
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for r_, s_ in zip(flat_r, flat_s):
        scale = float(jnp.abs(r_).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(s_, np.float32), np.asarray(r_, np.float32),
            rtol=0, atol=5e-2 * scale)


def test_stack_llama_int8_shape():
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.llama import init_llama
    from handsonvlm_tpu.ops.int8_matmul import quantize_llama

    cfg = tiny_config().llama
    q = quantize_llama(init_llama(jax.random.PRNGKey(0), cfg, jnp.float32))
    s = stack_llama_int8(q)
    assert set(s["layers"]) == {"int8", "attn_norm", "mlp_norm"}
    assert set(s["layers"]["int8"]) == {
        "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}
    assert s["layers"]["int8"]["wq"]["w8"].shape[0] == cfg.num_layers
