"""End-to-end training forward on the tiny full-architecture config."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import forward, init_handsonvlm

CFG = tiny_config()


def _batch(b=2, t=16):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(b, t))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    # answer contains 4 hand tokens
    hand_pos = [8, 10, 12, 14]
    ids[:, hand_pos] = HAND_TOKEN_ID
    labels = np.full((b, t), IGNORE_INDEX)
    labels[:, 7:] = ids[:, 7:]
    attn = np.ones((b, t), bool)
    images = rng.normal(size=(b, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)).astype(np.float32)
    future_hands = rng.uniform(size=(b, 2, 5, 2)).astype(np.float32)
    future_valid = np.ones((b, 2), np.float32)
    return dict(
        input_ids=jnp.asarray(ids),
        attn_mask=jnp.asarray(attn),
        images=jnp.asarray(images),
        labels=jnp.asarray(labels),
        future_hands=jnp.asarray(future_hands),
        future_valid=jnp.asarray(future_valid),
        rng=jax.random.PRNGKey(0),
    )


def test_forward_losses_finite():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    out = forward(params, CFG, **_batch(), attn_impl="xla")
    t_out = 16 + CFG.num_visual_tokens - 1
    assert out["logits"].shape == (2, t_out, CFG.llama.vocab_size)
    for k in ("loss", "text_loss", "traj_loss", "traj_kl_loss"):
        v = float(out[k])
        assert np.isfinite(v), (k, v)
    assert float(out["loss"]) > 0


def test_forward_grads_flow_everywhere_but_vision():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    batch = _batch()

    def loss_fn(p):
        return forward(p, CFG, **batch, attn_impl="xla")["loss"]

    grads = jax.grad(loss_fn)(params)

    def total(tree):
        return sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(tree))

    assert total(grads["vision"]) == 0.0  # frozen tower
    assert total(grads["llama"]) > 0.0
    assert total(grads["projector"]) > 0.0
    assert total(grads["traj"]) > 0.0


def test_forward_jits_and_is_deterministic():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    f = jax.jit(lambda p, b: forward(p, CFG, **b, attn_impl="xla")["loss"])
    l1 = float(f(params, batch))
    l2 = float(f(params, batch))
    assert l1 == l2


def test_forward_flash_kernel_matches_xla():
    """Full model with the Pallas flash kernel (interpret mode on CPU)."""
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    out_xla = forward(params, CFG, **batch, attn_impl="xla")
    out_flash = forward(params, CFG, **batch, attn_impl="flash")
    np.testing.assert_allclose(
        float(out_flash["loss"]), float(out_xla["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_flash["logits"]), np.asarray(out_xla["logits"]),
        atol=5e-4, rtol=1e-3,
    )
