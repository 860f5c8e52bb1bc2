"""ObjectTransformer stack: shapes, masking, losses, rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    apply_decoder,
    apply_encoder,
    encoder_input,
    hoi_forecast_loss,
    hoi_forecast_sample,
    init_object_transformer,
    object_transformer_forward,
    object_transformer_inference,
    sinusoidal_time_encoding,
    traj_affordance_dist,
)

CFG = ObjectTransformerConfig(
    token_dim=32, coord_dim=8, num_heads=4, enc_depth=2, dec_depth=2,
    hidden_dim=16, latent_dim=8,
)


def _batch(b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "feat": jnp.asarray(rng.normal(size=(b, 5, t, 1024)), jnp.float32),
        "bbox_feat": jnp.asarray(rng.uniform(size=(b, 4, t, 4)), jnp.float32),
        "valid_mask": jnp.ones((b, 5, t), jnp.float32),
        "future_hands": jnp.asarray(rng.uniform(size=(b, 2, 5, 2)), jnp.float32),
        "contact_point": jnp.asarray(rng.uniform(size=(b, 2)), jnp.float32),
        "future_valid": jnp.ones((b, 2), jnp.float32),
    }


def test_sinusoidal_encoding_matches_reference():
    import torch

    d, t = 32, 10
    pe = torch.zeros(t, d)
    position = torch.arange(0, t, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d, 2).float() * (-np.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    got = np.asarray(sinusoidal_time_encoding(t, d))
    np.testing.assert_allclose(got, pe.numpy(), atol=1e-6)


def test_forward_losses():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    losses = object_transformer_forward(
        params, CFG, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
        batch["future_hands"], batch["contact_point"], batch["future_valid"],
        jax.random.PRNGKey(1),
    )
    for k, v in losses.items():
        assert v.shape == (2,), (k, v.shape)
        assert np.all(np.isfinite(np.asarray(v))), k


def test_invalid_hands_zero_losses():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    batch["future_valid"] = jnp.zeros((2, 2))
    losses = object_transformer_forward(
        params, CFG, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
        batch["future_hands"], batch["contact_point"], batch["future_valid"],
        jax.random.PRNGKey(1),
    )
    np.testing.assert_allclose(np.asarray(losses["traj_loss"]), 0.0)
    np.testing.assert_allclose(np.asarray(losses["obj_loss"]), 0.0)


def test_encoder_mask_blocks_invalid_tokens():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    src_mask = batch["valid_mask"].transpose(0, 2, 1)
    tokens, src_mask = encoder_input(params, CFG, batch["feat"], batch["bbox_feat"], src_mask)
    out_full = apply_encoder(params["encoder"], CFG, tokens, src_mask)
    # invalidating a stream changes outputs, and the invalid stream's values
    # don't affect valid positions
    mask2 = src_mask.at[:, :, 2].set(0)
    out_masked = apply_encoder(params["encoder"], CFG, tokens, mask2)
    tokens_perturbed = tokens.at[:, :, 2, :].add(100.0)
    out_masked2 = apply_encoder(params["encoder"], CFG, tokens_perturbed, mask2)
    assert not np.allclose(np.asarray(out_full), np.asarray(out_masked))
    # positions other than stream 2 unaffected by its perturbation
    a = np.asarray(out_masked)
    c = np.asarray(out_masked2)
    np.testing.assert_allclose(
        np.delete(a, 2, axis=2), np.delete(c, 2, axis=2), atol=1e-4
    )


def test_decoder_causality():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    mem = jnp.asarray(rng.normal(size=(1, 5, CFG.token_dim)), jnp.float32)
    mem_mask = jnp.ones((1, 1, 5))
    coords = jnp.asarray(rng.uniform(size=(1, 4, 2)), jnp.float32)
    out1 = apply_decoder(params["decoder"], CFG, coords, mem, mem_mask)
    coords2 = coords.at[:, 3].set(99.0)  # change the last step
    out2 = apply_decoder(params["decoder"], CFG, coords2, mem, mem_mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out1[:, 3]), np.asarray(out2[:, 3]))


def test_inference_rollout():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    hands, contact = object_transformer_inference(
        params, CFG, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
        batch["future_valid"], jax.random.PRNGKey(5),
    )
    assert hands.shape == (2, 2, 4, 2)
    assert contact.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(hands)))


def test_loss_and_sample_wrappers():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    total, losses = hoi_forecast_loss(params, CFG, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    assert set(losses) == {
        "traj_loss", "traj_kl_loss", "obj_loss", "obj_kl_loss",
        "last_hand_loss", "total_loss",
    }
    hands, contacts = hoi_forecast_sample(params, CFG, batch, jax.random.PRNGKey(3), num_samples=3)
    assert hands.shape == (2, 3, 2, 4, 2)
    assert contacts.shape == (2, 3, 2)
    # stochastic across samples
    assert not np.allclose(np.asarray(hands[:, 0]), np.asarray(hands[:, 1]))


def test_traj_affordance_dist_prefers_valid_hand():
    hand_traj = jnp.asarray(np.tile([[0.0, 0.0]], (2 * 2 * 4, 1)), jnp.float32)
    contact = jnp.asarray([[0.0, 0.0], [1.0, 1.0]], jnp.float32)
    fv = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    d = traj_affordance_dist(hand_traj, contact, fv)
    assert d.shape == (2,)
    assert float(d[0]) == 0.0
    assert float(d[1]) == 2.0  # (1,1) vs (0,0) squared distance, valid hand


def test_global_variant():
    cfg = ObjectTransformerConfig(
        token_dim=32, coord_dim=8, num_heads=4, enc_depth=1, dec_depth=1,
        hidden_dim=16, latent_dim=8, num_patches=1, global_only=True,
    )
    params = init_object_transformer(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    hands, contact = object_transformer_inference(
        params, cfg, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
        batch["future_valid"], jax.random.PRNGKey(5),
    )
    assert hands.shape == (2, 2, 4, 2)
