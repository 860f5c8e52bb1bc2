"""LITA-HOI model family + hoi fuse modes."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.lita_hoi import init_lita_hoi, lita_hoi_forward, lita_hoi_inference
from handsonvlm_tpu.models.visual_tokens import fuse_hoi_features, init_hoi_encoder, visual_pipeline

CFG = tiny_config(fuse_input_mode="hoi", video_arch="none", mm_hidden_size=1024)


def _batch(b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "feat": jnp.asarray(rng.normal(size=(b, 5, t, 1024)), jnp.float32),
        "bbox_feat": jnp.asarray(rng.uniform(size=(b, 4, t, 4)), jnp.float32),
        "valid_mask": jnp.ones((b, 5, t), jnp.float32),
        "future_hands": jnp.asarray(rng.uniform(size=(b, 2, 5, 2)), jnp.float32),
        "contact_point": jnp.asarray(rng.uniform(size=(b, 2)), jnp.float32),
        "future_valid": jnp.ones((b, 2), jnp.float32),
        "gt_hand_valid": jnp.ones((b, 2, 5), bool),
    }


@pytest.mark.parametrize("mode,expect_s", [("hoi", 5), ("hoi-hand", 3), ("hoi-global", 1), ("clip", 1)])
def test_fuse_modes_shapes(mode, expect_s):
    rng = np.random.default_rng(0)
    hoi_params = init_hoi_encoder(jax.random.PRNGKey(0))
    proj = {"kernel": jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32) * 0.02,
            "bias": jnp.zeros(64)}
    b, t = 2, 10
    feat = jnp.asarray(rng.normal(size=(b, 5, t, 1024)), jnp.float32)
    bbox = jnp.asarray(rng.uniform(size=(b, 4, t, 4)), jnp.float32)
    valid = jnp.ones((b, 5, t))
    tokens, attn = fuse_hoi_features(hoi_params, proj, mode, feat, bbox, valid)
    assert tokens.shape == (b, t, expect_s, 64)
    assert attn.shape == (b, t, expect_s)


def test_ablation_modes():
    rng = np.random.default_rng(1)
    hoi_params = init_hoi_encoder(jax.random.PRNGKey(0))
    proj = {"kernel": jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32) * 0.02,
            "bias": jnp.zeros(64)}
    feat = jnp.asarray(rng.normal(size=(1, 5, 10, 1024)), jnp.float32)
    bbox = jnp.asarray(rng.uniform(size=(1, 4, 10, 4)), jnp.float32)
    valid = jnp.ones((1, 5, 10)).at[0, 2].set(0)

    t_zero, a_one = fuse_hoi_features(
        hoi_params, proj, "hoi-hand-random-zero-embed-one-attention", feat, bbox, valid
    )
    assert float(jnp.abs(t_zero).sum()) == 0.0
    assert bool(a_one.all())

    _, a_rev = fuse_hoi_features(hoi_params, proj, "hoi-reverse", feat, bbox, valid)
    _, a_fwd = fuse_hoi_features(hoi_params, proj, "hoi", feat, bbox, valid)
    np.testing.assert_array_equal(np.asarray(a_rev), ~np.asarray(a_fwd))

    t_rand, _ = fuse_hoi_features(
        hoi_params, proj, "hoi-random", feat, bbox, valid, rng=jax.random.PRNGKey(3)
    )
    t_norm, _ = fuse_hoi_features(hoi_params, proj, "hoi", feat, bbox, valid)
    assert not np.allclose(np.asarray(t_rand), np.asarray(t_norm))


def test_lita_hoi_training_loss():
    params = init_lita_hoi(jax.random.PRNGKey(0), CFG)
    loss, losses = lita_hoi_forward(params, CFG, _batch(), jax.random.PRNGKey(1), attn_impl="xla")
    assert np.isfinite(float(loss))
    for k in ("traj_loss", "obj_loss", "last_hand_loss", "hoi_forecast_loss"):
        assert np.isfinite(float(losses[k])), k


def test_lita_hoi_inference():
    params = init_lita_hoi(jax.random.PRNGKey(0), CFG)
    hands, contact = lita_hoi_inference(params, CFG, _batch(), jax.random.PRNGKey(2), attn_impl="xla")
    assert hands.shape == (2, 2, 4, 2)
    assert contact.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(hands)))


def test_lita_hoi_hand_mode():
    cfg = dataclasses.replace(CFG, fuse_input_mode="hoi-hand")
    params = init_lita_hoi(jax.random.PRNGKey(0), cfg)
    loss, _ = lita_hoi_forward(params, cfg, _batch(), jax.random.PRNGKey(1), attn_impl="xla")
    assert np.isfinite(float(loss))
