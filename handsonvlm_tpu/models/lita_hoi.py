"""LITA-HOI model family: LLM-encoded hoi features + transformer heads.

Behavioral spec from `handsonvlm/model/language_model/lita_llama_hoi.py:
18-423` (the earlier/alternative HandsOnVLM architecture): the Vicuna
decoder *encodes* the fused hoi visual tokens (video_compress_mode 'none',
fuse modes 'hoi'/'hoi-hand'/'hoi-global'); the hidden states of the last
observed frame's tokens feed an ObjectTransformerDecoder + TrajCVAE +
AffordanceCVAE stack with teacher-forced training and autoregressive
coordinate rollout at inference.

Differences vs the standalone ObjectTransformer preserved: the contact-loss
validity gate here is per-element (`obj_loss[~(future_valid > 0)] = 1e9`,
lita_llama_hoi.py:173) while the standalone model gates on the batch-global
sum; the λ weights come from config and are folded in before summing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import HandsOnVLMConfig, TrajDecoderConfig
from handsonvlm_tpu.models.llama import apply_llama, init_llama
from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    _dec_block,
    _linear,
    _ln,
    affordance_condition,
    affordance_forward,
    affordance_inference,
    apply_decoder,
    traj_affordance_dist,
)
from handsonvlm_tpu.models.traj_cvae import (
    _apply,
    cvae_forward,
    cvae_inference,
    init_traj_decoder,
)
from handsonvlm_tpu.models.visual_tokens import init_hoi_encoder, visual_pipeline


def _oct_cfg(cfg: HandsOnVLMConfig) -> ObjectTransformerConfig:
    return ObjectTransformerConfig(
        token_dim=cfg.llama.hidden_size,
        coord_dim=64,
        num_heads=8,
        dec_depth=4,
        hidden_dim=cfg.traj.hidden_dim,
        latent_dim=cfg.traj.latent_dim,
        z_scale=cfg.traj.z_scale,
    )


def init_lita_hoi(rng: jax.Array, cfg: HandsOnVLMConfig):
    """Full LITA-HOI parameter tree."""
    ks = jax.random.split(rng, 8)
    d = cfg.llama.hidden_size
    oct_cfg = _oct_cfg(cfg)
    head_cfg = TrajDecoderConfig(
        kind="CVAE", hidden_dim=cfg.traj.hidden_dim, latent_dim=cfg.traj.latent_dim,
        coord_dim=64, z_scale=cfg.traj.z_scale,
    )
    t1 = 5  # pred_len + 1
    dtype = cfg.pdtype
    return {
        "llama": init_llama(ks[0], cfg.llama, dtype),
        "hoi_encoder": init_hoi_encoder(ks[1], dtype),
        "projector": {
            "kernel": (jax.random.normal(ks[2], (cfg.mm_hidden_size, d)) * 0.02).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "oct_decoder": {
            "target_embedding": _linear(ks[3], 2, d, dtype),
            "blocks": [_dec_block(jax.random.fold_in(ks[4], i), oct_cfg, dtype) for i in range(oct_cfg.dec_depth)],
            "norm": _ln(d, dtype),
        },
        "hand_head": init_traj_decoder(ks[5], head_cfg, d, dtype),
        "affordance": {
            "traj_to_feature": _linear(ks[6], 2 * t1, 64 * t1, dtype, bias=False),
            "traj_context_fusion": _linear(jax.random.fold_in(ks[6], 1), d + 64 * t1, d, dtype, bias=False),
            "cvae": init_traj_decoder(jax.random.fold_in(ks[6], 2), head_cfg, d, dtype),
        },
        "last_obs_rhand": _linear(ks[7], d, d, dtype),
        "last_obs_lhand": _linear(jax.random.fold_in(ks[7], 1), d, d, dtype),
    }


def _last_hidden_state(cfg: HandsOnVLMConfig, hidden, valid_mask):
    """_get_last_hidden_state (lita_llama_hoi.py:79-95): the trailing tokens
    of the sequence are the last observed frame's streams."""
    mode = cfg.fuse_input_mode
    last_frame_mask = valid_mask[:, :, -1]  # (B, 5)
    if mode.startswith("hoi-hand"):
        last, mask = hidden[:, -3:, :], last_frame_mask[:, :3]
    elif mode.startswith("hoi-global"):
        last, mask = hidden[:, -1:, :], last_frame_mask[:, :1]
    elif mode.startswith("hoi"):
        last, mask = hidden[:, -5:, :], last_frame_mask
    else:
        raise NotImplementedError(mode)
    return last, (mask != 0)[:, None, :]  # (B,1,N)


def _encode(params, cfg: HandsOnVLMConfig, feat, bbox_feat, valid_mask, rng, attn_impl):
    assert cfg.video_arch in ("none", "all"), "lita-hoi requires compress mode 'none'"
    visual_tokens, visual_attn = visual_pipeline(
        params, cfg, feat=feat, bbox_feat=bbox_feat, valid_mask=valid_mask,
        rng=rng, attn_impl=attn_impl,
    )
    hidden, _ = apply_llama(
        params["llama"], cfg.llama, inputs_embeds=visual_tokens,
        attn_mask=visual_attn, attn_impl=attn_impl,
    )
    return _last_hidden_state(cfg, hidden, valid_mask)


def lita_hoi_forward(
    params, cfg: HandsOnVLMConfig, batch: Dict, rng: jax.Array,
    lambda_obj=0.1, lambda_obj_kl=1e-3, lambda_last_hand=1e-3,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, Dict]:
    """Training loss (forward + forward_decoder_and_get_loss)."""
    oct_cfg = _oct_cfg(cfg)
    head_cfg = TrajDecoderConfig(
        hidden_dim=cfg.traj.hidden_dim, latent_dim=cfg.traj.latent_dim,
        z_scale=cfg.traj.z_scale,
    )
    r_enc, r_tf, r_obj_r, r_obj_l = jax.random.split(rng, 4)
    feat, bbox_feat, valid_mask = batch["feat"], batch["bbox_feat"], batch["valid_mask"]
    future_hands, contact_point = batch["future_hands"], batch["contact_point"]
    future_valid = batch["future_valid"]
    b = feat.shape[0]
    t_pred = future_hands.shape[2]
    d = cfg.llama.hidden_size

    last_hidden, memory_mask = _encode(params, cfg, feat, bbox_feat, valid_mask, r_enc, attn_impl)

    gt_rhand, gt_lhand = future_hands[:, 0], future_hands[:, 1]
    rh_emb = apply_decoder(params["oct_decoder"], oct_cfg, gt_rhand[:, :-1], last_hidden, memory_mask)
    lh_emb = apply_decoder(params["oct_decoder"], oct_cfg, gt_lhand[:, :-1], last_hidden, memory_mask)

    gt_emb = jnp.concatenate([rh_emb, lh_emb], axis=1).reshape(-1, d)
    gt_target = future_hands[:, :, 1:, :].reshape(-1, 2)
    _, recon, kld = cvae_forward(params["hand_head"], gt_target, gt_emb, r_tf)
    fv = future_valid.astype(jnp.float32)
    recon = recon.reshape(b, 2, t_pred - 1).sum(-1)
    traj_loss = (recon * fv).sum(1)
    # reference quirk: whole-batch KL sum scaled by valid counts
    # (traj_decoder.py:66-67)
    traj_kl_loss = kld.sum() * fv.sum(1)

    global_tok = last_hidden[:, 0]
    pred_r = _apply(params["last_obs_rhand"], global_tok)
    pred_l = _apply(params["last_obs_lhand"], global_tok)
    last_hand = jnp.stack(
        [jnp.mean((pred_r - rh_emb[:, 0]) ** 2, -1), jnp.mean((pred_l - lh_emb[:, 0]) ** 2, -1)],
        axis=1,
    )

    r_obj, r_kl = affordance_forward(params["affordance"], global_tok, contact_point, gt_rhand, r_obj_r)
    l_obj, l_kl = affordance_forward(params["affordance"], global_tok, contact_point, gt_lhand, r_obj_l)
    obj_loss = jnp.stack([r_obj, l_obj], axis=1)
    obj_kl = jnp.stack([r_kl, l_kl], axis=1)
    # per-element validity gate (lita_llama_hoi.py:173)
    obj_loss = jnp.where(future_valid > 0, obj_loss, 1e9)
    sel = jnp.argmin(obj_loss, axis=1)
    sel_valid = jnp.take_along_axis(fv, sel[:, None], 1)[:, 0]
    sel_obj = jnp.take_along_axis(obj_loss, sel[:, None], 1)[:, 0] * sel_valid
    sel_kl = jnp.take_along_axis(obj_kl, sel[:, None], 1)[:, 0] * sel_valid
    sel_last = jnp.take_along_axis(last_hand, sel[:, None], 1)[:, 0] * sel_valid

    losses = {
        "obj_loss": lambda_obj * sel_obj.sum(),
        "obj_kl_loss": cfg.lambda_traj_kl * sel_kl.sum(),
        "traj_loss": cfg.lambda_traj * traj_loss.sum(),
        "traj_kl_loss": cfg.lambda_traj_kl * traj_kl_loss.sum(),
        "last_hand_loss": lambda_last_hand * sel_last.sum(),
    }
    losses["hoi_forecast_loss"] = sum(losses.values())
    loss = cfg.hoi_lambda * losses["hoi_forecast_loss"]
    return loss, losses


def lita_hoi_inference(
    params, cfg: HandsOnVLMConfig, batch: Dict, rng: jax.Array,
    pred_len: int = 4, attn_impl: str = "auto",
):
    """Autoregressive rollout (lita_llama_hoi.py:294-404).

    Returns (pred_hand (B,2,pred_len,2), pred_contact (B,2))."""
    oct_cfg = _oct_cfg(cfg)
    head_cfg = TrajDecoderConfig(
        hidden_dim=cfg.traj.hidden_dim, latent_dim=cfg.traj.latent_dim,
        coord_dim=64, z_scale=cfg.traj.z_scale,
    )
    feat, bbox_feat, valid_mask = batch["feat"], batch["bbox_feat"], batch["valid_mask"]
    b = feat.shape[0]
    rngs = jax.random.split(rng, 8)

    last_hidden, memory_mask = _encode(params, cfg, feat, bbox_feat, valid_mask, rngs[0], attn_impl)
    global_tok = last_hidden[:, 0]
    first_r = cvae_inference(params["hand_head"], head_cfg, _apply(params["last_obs_rhand"], global_tok), rngs[1])
    first_l = cvae_inference(params["hand_head"], head_cfg, _apply(params["last_obs_lhand"], global_tok), rngs[2])

    def rollout(first, rng_base):
        coords = jnp.zeros((b, pred_len + 1, 2), first.dtype).at[:, 0].set(first)

        def body(i, coords):
            emb = apply_decoder(params["oct_decoder"], oct_cfg, coords[:, :-1], last_hidden, memory_mask)
            step = jax.lax.dynamic_index_in_dim(emb, i, axis=1, keepdims=False)
            nxt = cvae_inference(params["hand_head"], head_cfg, step, jax.random.fold_in(rng_base, i))
            return coords.at[:, i + 1].set(nxt)

        return jax.lax.fori_loop(0, pred_len, body, coords)

    rhand = rollout(first_r, rngs[3])
    lhand = rollout(first_l, rngs[4])
    pred_hand = jnp.stack([rhand[:, 1:], lhand[:, 1:]], axis=1)

    r_contact = affordance_inference(params["affordance"], oct_cfg, global_tok, rhand, rngs[5])
    l_contact = affordance_inference(params["affordance"], oct_cfg, global_tok, lhand, rngs[6])
    pred_contact = jnp.stack([r_contact, l_contact], axis=1)

    gt_valid = batch.get("gt_hand_valid")
    if gt_valid is not None:
        traj_valid = gt_valid.any(axis=-1).astype(jnp.float32)
        r_dist = traj_affordance_dist(pred_hand.reshape(-1, 2), r_contact, traj_valid)
        l_dist = traj_affordance_dist(pred_hand.reshape(-1, 2), l_contact, traj_valid)
        sel = jnp.argmin(jnp.stack([r_dist, l_dist], axis=1), axis=1)
        contact = jnp.take_along_axis(pred_contact, sel[:, None, None], axis=1)[:, 0]
    else:
        contact = pred_contact[:, 0]
    return pred_hand, contact
