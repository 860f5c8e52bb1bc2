"""Parity for the VMEM-resident ViT attention kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handsonvlm_tpu.ops.attention import _best_impl, attention, attention_xla
from handsonvlm_tpu.ops.vit_attention import vit_attention, vit_attention_ok


@pytest.mark.parametrize("b,t,h,d,fb", [
    (3, 257, 4, 64, 1),   # CLIP-like odd T, B indivisible
    (4, 64, 16, 64, 4),   # multi-frame blocks
    (2, 9, 2, 64, 2),     # tiny ragged T
])
def test_vit_attention_matches_xla(b, t, h, d, fb):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, t, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, t, h, d)).astype(jnp.bfloat16)
    out = vit_attention(q, k, v, frames_per_block=fb)
    ref = attention_xla(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_vit_impl_reachable_through_attention_entry():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (2, 33, 2, 64)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 33, 2, 64)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 33, 2, 64)).astype(jnp.bfloat16)
    out = attention(q, k, v, causal=False, impl="vit")
    ref = attention_xla(q, k, v, causal=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_vit_attention_differentiable():
    """remat linearization requires a VJP even when CLIP is frozen — a bare
    pallas_call broke the jitted train step (bench train mode, 2026-08-17)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (2, 17, 2, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, 17, 2, 64), jnp.float32)
    v = jax.random.normal(ks[2], (2, 17, 2, 64), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(vit_attention(q, k, v) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        attention_xla(q, k, v, causal=False) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
    # and under remat + jit, the combination that actually broke
    f = jax.jit(lambda q, k, v: jax.grad(
        lambda q: jnp.sum(jax.checkpoint(
            lambda q: vit_attention(jax.lax.stop_gradient(q), k, v))(q)))(q))
    assert np.isfinite(np.asarray(f(q, k, v))).all()


def test_vit_dispatch_predicate():
    q = jnp.zeros((10, 257, 16, 64), jnp.bfloat16)
    mask = jnp.ones((10, 257), bool)
    assert vit_attention_ok(q, q, q, None, False)
    assert not vit_attention_ok(q, q, q, mask, False)  # masked: no
    assert not vit_attention_ok(q, q, q, None, True)   # causal: no
    d128 = jnp.zeros((1, 257, 16, 128), jnp.bfloat16)
    assert not vit_attention_ok(d128, d128, d128, None, False)
    # CPU always routes to xla regardless of the predicate
    assert _best_impl(q, None, key_mask=None, causal=False,
                      kv_shape=q.shape) == "xla"


def test_vmem_gate():
    """Shapes whose 1-frame working set exceeds the scoped-VMEM budget must
    not route to the kernel (remote compile would HTTP-500), and the fb
    picker must shrink blocks under the budget."""
    from handsonvlm_tpu.ops.vit_attention import (
        _VMEM_BUDGET, _vmem_est, vit_attention_ok)

    # t=1024 x 16 heads: 25 MB working set even at fb=1 — must reject
    big = jnp.zeros((16, 1024, 16, 64), jnp.bfloat16)
    assert _vmem_est(1, 1024, 1024) > _VMEM_BUDGET
    assert not vit_attention_ok(big, big, big, None, False)
    # CLIP-L 336px (t=577) squeaks in at fb=1 (12.1M <= 12M budget)
    b336 = jnp.zeros((16, 577, 16, 64), jnp.bfloat16)
    assert vit_attention_ok(b336, b336, b336, None, False)
    # CLIP-L 224px stays in: fb=2 under budget (the measured config)
    ok = jnp.zeros((16, 257, 16, 64), jnp.bfloat16)
    assert _vmem_est(2, 257, 1024) <= _VMEM_BUDGET
    assert vit_attention_ok(ok, ok, ok, None, False)
    # fb=4 at CLIP shapes reproduces the measured 19.4M OOM
    assert _vmem_est(4, 257, 1024) > 16 * 1024 * 1024
