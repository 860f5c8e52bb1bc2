"""hoi-forecast ObjectTransformer stack (encoder-decoder + CVAE heads).

Behavioral spec from `hoi_forecast/architecture/{object_transformer,layer,
embedding,net_utils,affordance_decoder}.py`:

- joint space-time encoder over 5 patch streams (global/hands/objects) with
  learned space pos-embed + sinusoidal time encoding, pre-norm blocks,
  pad-mask fill of -1e30;
- coordinate decoder: (x,y) -> token embed, causal self-attn + cross-attn
  to the last observed frame's tokens. The reference's DecoderBlock feeds
  its MLP from the *second* norm's output rather than norm3
  (layer.py:148) — replicated;
- TrajCVAE hand head (reused from models/traj_cvae.py) + AffordanceCVAE
  contact head conditioned on the global token and a trajectory;
- training losses incl. min-hand contact selection and the last-observation
  hand-embedding MSE (object_transformer.py:302-338);
- autoregressive coordinate rollout + contact selection at inference
  (object_transformer.py:340-425).

TPU notes: attention over N*T=50 tokens is tiny — everything fuses under
one jit; the autoregressive rollout runs the decoder at the fixed final
length with causal masking (static shapes) instead of growing tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from handsonvlm_tpu.core.config import TrajDecoderConfig
from handsonvlm_tpu.models.traj_cvae import (
    _apply,
    _cvae_decode,
    cvae_forward,
    cvae_inference,
    init_traj_decoder,
)

MASK_VALUE = -1e30


@dataclasses.dataclass(frozen=True)
class ObjectTransformerConfig:
    src_in_features: int = 1024
    trg_in_features: int = 2
    num_patches: int = 5
    token_dim: int = 512
    coord_dim: int = 64
    num_heads: int = 8
    enc_depth: int = 6
    dec_depth: int = 4
    mlp_ratio: float = 4.0
    hidden_dim: int = 512  # CVAE heads
    latent_dim: int = 256
    pred_len: int = 4
    z_scale: float = 2.0
    global_only: bool = False  # ObjectTransformer_global variant


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _linear(rng, din, dout, dtype, bias=True):
    k1, k2 = jax.random.split(rng)
    # reference init: trunc_normal std 0.02, zero bias
    w = jax.random.truncated_normal(k1, -2.0, 2.0, (din, dout)) * 0.02
    p = {"kernel": w.astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def _ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _mha(rng, dim, dtype):
    ks = jax.random.split(rng, 4)
    return {
        "wq": _linear(ks[0], dim, dim, dtype, bias=False),
        "wk": _linear(ks[1], dim, dim, dtype, bias=False),
        "wv": _linear(ks[2], dim, dim, dtype, bias=False),
        "proj": _linear(ks[3], dim, dim, dtype),
    }


def _enc_block(rng, cfg, dtype):
    ks = jax.random.split(rng, 2)
    d, f = cfg.token_dim, int(cfg.token_dim * cfg.mlp_ratio)
    return {
        "norm1": _ln(d, dtype),
        "attn": _mha(ks[0], d, dtype),
        "norm2": _ln(d, dtype),
        "mlp": {"fc1": _linear(jax.random.fold_in(ks[1], 0), d, f, dtype),
                "fc2": _linear(jax.random.fold_in(ks[1], 1), f, d, dtype)},
    }


def _dec_block(rng, cfg, dtype):
    ks = jax.random.split(rng, 3)
    d, f = cfg.token_dim, int(cfg.token_dim * cfg.mlp_ratio)
    return {
        "norm1": _ln(d, dtype),
        "self_attn": _mha(ks[0], d, dtype),
        "norm2": _ln(d, dtype),
        "cross_attn": _mha(ks[1], d, dtype),
        "norm3": _ln(d, dtype),  # present in the reference but unused (quirk)
        "mlp": {"fc1": _linear(jax.random.fold_in(ks[2], 0), d, f, dtype),
                "fc2": _linear(jax.random.fold_in(ks[2], 1), f, d, dtype)},
    }


def init_object_transformer(rng: jax.Array, cfg: ObjectTransformerConfig, dtype=jnp.float32):
    ks = jax.random.split(rng, 12)
    head_cfg = TrajDecoderConfig(
        kind="CVAE", hidden_dim=cfg.hidden_dim, latent_dim=cfg.latent_dim,
        coord_dim=cfg.coord_dim, z_scale=cfg.z_scale,
    )
    t1 = cfg.pred_len + 1
    params = {
        "downproject": _linear(ks[0], cfg.src_in_features, cfg.token_dim, dtype),
        "bbox_to_feature": {
            "fc1": _linear(ks[1], 4, cfg.coord_dim // 2, dtype),
            "fc2": _linear(jax.random.fold_in(ks[1], 1), cfg.coord_dim // 2, cfg.coord_dim, dtype),
        },
        "feat_fusion": _linear(ks[2], cfg.token_dim + cfg.coord_dim, cfg.token_dim, dtype),
        "encoder": {
            "pos_embed": (jax.random.truncated_normal(ks[3], -2, 2, (1, cfg.num_patches, cfg.token_dim)) * 0.02).astype(dtype),
            "blocks": [_enc_block(jax.random.fold_in(ks[4], i), cfg, dtype) for i in range(cfg.enc_depth)],
            "norm": _ln(cfg.token_dim, dtype),
        },
        "decoder": {
            "target_embedding": _linear(ks[5], cfg.trg_in_features, cfg.token_dim, dtype),
            "blocks": [_dec_block(jax.random.fold_in(ks[6], i), cfg, dtype) for i in range(cfg.dec_depth)],
            "norm": _ln(cfg.token_dim, dtype),
        },
        "last_obs_rhand": _linear(ks[7], cfg.token_dim, cfg.token_dim, dtype),
        "last_obs_lhand": _linear(ks[8], cfg.token_dim, cfg.token_dim, dtype),
        "hand_head": init_traj_decoder(ks[9], head_cfg, cfg.token_dim, dtype),
        "obj_head": {
            "traj_to_feature": _linear(ks[10], 2 * t1, cfg.coord_dim * t1, dtype, bias=False),
            "traj_context_fusion": _linear(
                jax.random.fold_in(ks[10], 1),
                cfg.token_dim + cfg.coord_dim * t1, cfg.token_dim, dtype, bias=False,
            ),
            "cvae": init_traj_decoder(ks[11], head_cfg, cfg.token_dim, dtype),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(p, q, k, v, num_heads, mask=None):
    """MultiHeadAttention (layer.py:48-82): separate projections, divisor
    temperature head_dim**0.5, mask==0 filled with -1e30."""
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    qh = (q @ p["wq"]["kernel"]).reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = (k @ p["wk"]["kernel"]).reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = (v @ p["wv"]["kernel"]).reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh / (hd**0.5), kh, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None] != 0, scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh).transpose(0, 2, 1, 3).reshape(b, nq, c)
    return _apply(p["proj"], out)


def _mlp(p, x):
    return _apply(p["fc2"], jax.nn.gelu(_apply(p["fc1"], x), approximate=False))


def _encoder_block(p, x, num_heads, mask):
    x2 = _layer_norm(x, p["norm1"])
    x = x + _attention(p["attn"], x2, x2, x2, num_heads, mask=mask)
    x = x + _mlp(p["mlp"], _layer_norm(x, p["norm2"]))
    return x


def _decoder_block(p, hand, memory, memory_mask, causal_mask, num_heads):
    h1 = _layer_norm(hand, p["norm1"])
    hand = hand + _attention(p["self_attn"], h1, h1, h1, num_heads, mask=causal_mask)
    h2 = _layer_norm(hand, p["norm2"])
    hand = hand + _attention(p["cross_attn"], h2, memory, memory, num_heads, mask=memory_mask)
    # reference quirk: MLP consumes h2, not a third norm (layer.py:148)
    hand = hand + _mlp(p["mlp"], h2)
    return hand


def sinusoidal_time_encoding(t: int, d: int) -> jnp.ndarray:
    """PositionalEncoding (embedding.py:7-21)."""
    position = np.arange(t)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d, 2).astype(np.float32) * (-np.log(10000.0) / d))
    pe = np.zeros((t, d), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


def apply_encoder(params, cfg: ObjectTransformerConfig, tokens: jnp.ndarray, valid_mask: jnp.ndarray):
    """tokens (B,T,N,D), valid_mask (B,T,N) -> (B,T,N,D)."""
    b, t, n, d = tokens.shape
    x = tokens + params["pos_embed"].astype(tokens.dtype)  # space
    time_enc = sinusoidal_time_encoding(t, d).astype(tokens.dtype)
    x = x + time_enc[None, :, None, :]  # time
    x = x.transpose(0, 2, 1, 3).reshape(b, n * t, d)  # (B, (n t), D)
    # pad mask over keys: (B, 1, N*T) — valid_mask transposed to (B,N,T)
    mask = valid_mask.transpose(0, 2, 1).reshape(b, 1, n * t)
    for blk in params["blocks"]:
        x = _encoder_block(blk, x, cfg.num_heads, mask)
    x = x.reshape(b, n, t, d).transpose(0, 2, 1, 3)
    return _layer_norm(x, params["norm"])


def apply_decoder(params, cfg: ObjectTransformerConfig, coords: jnp.ndarray, memory: jnp.ndarray, memory_mask: jnp.ndarray, causal_mask: Optional[jnp.ndarray] = None):
    """coords (B,T,2), memory (B,N,D), memory_mask (B,1,N) -> (B,T,D)."""
    b, t, _ = coords.shape
    d = cfg.token_dim
    x = _apply(params["target_embedding"], coords)
    x = x + sinusoidal_time_encoding(t, d).astype(x.dtype)[None]
    if causal_mask is None:
        causal_mask = jnp.tril(jnp.ones((1, t, t)), 0)  # subsequent mask
    for blk in params["blocks"]:
        x = _decoder_block(blk, x, memory, memory_mask, causal_mask, cfg.num_heads)
    return _layer_norm(x, params["norm"])


def encoder_input(params, cfg: ObjectTransformerConfig, feat, bbox_feat, src_mask):
    """(B,5,T,1024) + (B,4,T,4) -> (B,T,5,D) fused tokens
    (object_transformer.py:186-227); global-only variant keeps just the
    global stream (448-459)."""
    b, _, t, _ = feat.shape
    feat = _apply(params["downproject"], feat)
    if cfg.global_only:
        return feat[:, 0:1].transpose(0, 2, 1, 3), src_mask[:, :, :1]
    bb = jax.nn.elu(_apply(params["bbox_to_feature"]["fc1"], bbox_feat))
    bb = jax.nn.elu(_apply(params["bbox_to_feature"]["fc2"], bb))  # (B,4,T,coord)
    ho = jnp.concatenate([feat[:, 1:], bb], axis=-1)
    ho = jax.nn.elu(_apply(params["feat_fusion"], ho))  # (B,4,T,D)
    fused = jnp.concatenate([feat[:, 0:1], ho], axis=1)  # (B,5,T,D)
    return fused.transpose(0, 2, 1, 3), src_mask


# ---------------------------------------------------------------------------
# Affordance head
# ---------------------------------------------------------------------------


def affordance_condition(params, global_token, hand_traj):
    b = global_token.shape[0]
    traj = hand_traj.reshape(b, -1)
    traj_feat = jax.nn.elu(traj @ params["traj_to_feature"]["kernel"])
    fusion = jnp.concatenate([global_token, traj_feat], axis=1)
    return jax.nn.elu(fusion @ params["traj_context_fusion"]["kernel"])


def affordance_forward(params, global_token, contact_point, hand_traj, rng):
    cond = affordance_condition(params, global_token, hand_traj)
    _, recon, kld = cvae_forward(params["cvae"], contact_point, cond, rng)
    return recon, kld


def affordance_inference(params, cfg: ObjectTransformerConfig, global_token, hand_traj, rng):
    cond = affordance_condition(params, global_token, hand_traj)
    head_cfg = TrajDecoderConfig(latent_dim=cfg.latent_dim, z_scale=cfg.z_scale)
    return cvae_inference(params["cvae"], head_cfg, cond, rng)


def traj_affordance_dist(hand_traj, contact_point, future_valid, invalid_value=9.0):
    """net_utils.traj_affordance_dist: min squared distance between the
    predicted trajectory points and a contact point, hand-selected by
    validity. hand_traj (B*2*T,2), contact_point (B,2), future_valid (B,2)."""
    b = contact_point.shape[0]
    expand = hand_traj.shape[0] // b
    cp = jnp.broadcast_to(contact_point[:, None, :], (b, expand, 2)).reshape(-1, 2)
    dist = jnp.sum((hand_traj - cp) ** 2, axis=1).reshape(b, 2, -1)
    valid = future_valid > 0
    dist = jnp.where(valid[:, :, None], dist, invalid_value)
    per_hand = jnp.min(dist, axis=-1)  # (B,2)
    sel = jnp.argmin(per_hand, axis=1)
    sel_valid = jnp.take_along_axis(valid, sel[:, None], axis=1)[:, 0]
    return jnp.take_along_axis(per_hand, sel[:, None], axis=1)[:, 0] * sel_valid


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def object_transformer_forward(
    params, cfg: ObjectTransformerConfig,
    feat, bbox_feat, valid_mask, future_hands, contact_point, future_valid,
    rng: jax.Array,
):
    """Teacher-forced training losses (object_transformer.py:229-338).

    Returns dict(traj_loss, traj_kl_loss, obj_loss, obj_kl_loss,
    last_hand_loss), each (B,).
    """
    b, _, t_obs, _ = feat.shape
    t_pred = future_hands.shape[2]
    r_tf, r_obj_r, r_obj_l = jax.random.split(rng, 3)

    src_mask = valid_mask.transpose(0, 2, 1)  # (B,T,5)
    tokens, src_mask = encoder_input(params, cfg, feat, bbox_feat, src_mask)
    hidden = apply_encoder(params["encoder"], cfg, tokens, src_mask)
    last_hidden = hidden[:, -1]  # (B,N,D)
    memory_mask = (src_mask[:, -1, :] != 0)[:, None, :]  # (B,1,N)

    gt_rhand = future_hands[:, 0]
    gt_lhand = future_hands[:, 1]
    rh_emb = apply_decoder(params["decoder"], cfg, gt_rhand[:, :-1], last_hidden, memory_mask)
    lh_emb = apply_decoder(params["decoder"], cfg, gt_lhand[:, :-1], last_hidden, memory_mask)

    gt_hand_embedding = jnp.concatenate([rh_emb, lh_emb], axis=1).reshape(-1, cfg.token_dim)
    gt_target = future_hands[:, :, 1:, :].reshape(-1, 2)
    _, recon, kld = cvae_forward(params["hand_head"], gt_target, gt_hand_embedding, r_tf)
    recon = recon.reshape(b, 2, t_pred - 1).sum(-1)
    fv = future_valid.astype(recon.dtype)
    traj_loss = (recon * fv).sum(1)
    # reference quirk: KL summed over the whole flattened batch, scaled by
    # each sample's valid count (traj_decoder.py:66-67)
    traj_kl_loss = kld.sum() * fv.sum(1)

    # last-observation hand-embedding MSE (object_transformer.py:302-314)
    global_token = last_hidden[:, 0]
    pred_r = _apply(params["last_obs_rhand"], global_token)
    pred_l = _apply(params["last_obs_lhand"], global_token)
    rhl = jnp.mean((pred_r - rh_emb[:, 0]) ** 2, axis=-1)
    lhl = jnp.mean((pred_l - lh_emb[:, 0]) ** 2, axis=-1)
    last_hand_loss = jnp.stack([rhl, lhl], axis=1)  # (B,2)

    # contact losses, min-hand selection (object_transformer.py:316-337)
    r_obj, r_kl = affordance_forward(params["obj_head"], global_token, contact_point, gt_rhand, r_obj_r)
    l_obj, l_kl = affordance_forward(params["obj_head"], global_token, contact_point, gt_lhand, r_obj_l)
    obj_loss = jnp.stack([r_obj, l_obj], axis=1)
    obj_kl = jnp.stack([r_kl, l_kl], axis=1)
    # reference quirk: batch-global validity gate (future_valid.sum() > 0)
    any_valid = future_valid.sum() > 0
    obj_loss = jnp.where(any_valid, obj_loss, 1e9)

    sel = jnp.argmin(obj_loss, axis=1)
    sel_valid = jnp.take_along_axis(future_valid.astype(obj_loss.dtype), sel[:, None], 1)[:, 0]
    sel_obj = jnp.take_along_axis(obj_loss, sel[:, None], 1)[:, 0] * sel_valid
    sel_kl = jnp.take_along_axis(obj_kl, sel[:, None], 1)[:, 0] * sel_valid
    sel_last = jnp.take_along_axis(last_hand_loss, sel[:, None], 1)[:, 0] * sel_valid

    return {
        "traj_loss": traj_loss,
        "traj_kl_loss": traj_kl_loss,
        "obj_loss": sel_obj,
        "obj_kl_loss": sel_kl,
        "last_hand_loss": sel_last,
    }


def object_transformer_inference(
    params, cfg: ObjectTransformerConfig,
    feat, bbox_feat, valid_mask, future_valid, rng: jax.Array, pred_len: int = 4,
):
    """Autoregressive rollout (object_transformer.py:340-425).

    Returns (pred_hand (B,2,pred_len,2), pred_contact (B,2)).
    """
    b = feat.shape[0]
    head_cfg = TrajDecoderConfig(
        latent_dim=cfg.latent_dim, z_scale=cfg.z_scale, hidden_dim=cfg.hidden_dim,
        coord_dim=cfg.coord_dim,
    )
    src_mask = valid_mask.transpose(0, 2, 1)
    tokens, src_mask = encoder_input(params, cfg, feat, bbox_feat, src_mask)
    hidden = apply_encoder(params["encoder"], cfg, tokens, src_mask)
    last_hidden = hidden[:, -1]
    memory_mask = (src_mask[:, -1, :] != 0)[:, None, :]
    global_token = last_hidden[:, 0]

    rngs = jax.random.split(rng, 2 * (pred_len + 1) + 3)
    pred_r0 = cvae_inference(params["hand_head"], head_cfg, _apply(params["last_obs_rhand"], global_token), rngs[0])
    pred_l0 = cvae_inference(params["hand_head"], head_cfg, _apply(params["last_obs_lhand"], global_token), rngs[1])

    # fixed-shape rollout: coords buffer (B, pred_len+1, 2), step i reads the
    # decoder at full length with causal masking and takes position i
    def rollout(first, rng_base):
        coords = jnp.zeros((b, pred_len + 1, 2), first.dtype).at[:, 0].set(first)
        def body(i, coords):
            emb = apply_decoder(params["decoder"], cfg, coords[:, :-1], last_hidden, memory_mask)
            step = jax.lax.dynamic_index_in_dim(emb, i, axis=1, keepdims=False)
            nxt = cvae_inference(params["hand_head"], head_cfg, step, jax.random.fold_in(rng_base, i))
            return coords.at[:, i + 1].set(nxt)
        return jax.lax.fori_loop(0, pred_len, body, coords)

    rhand = rollout(pred_r0, rngs[2])
    lhand = rollout(pred_l0, rngs[3])
    pred_hand = jnp.stack([rhand[:, 1:], lhand[:, 1:]], axis=1)  # (B,2,T,2)

    r_contact = affordance_inference(params["obj_head"], cfg, global_token, rhand, rngs[4])
    l_contact = affordance_inference(params["obj_head"], cfg, global_token, lhand, rngs[5])
    pred_contact = jnp.stack([r_contact, l_contact], axis=1)  # (B,2,2)

    r_dist = traj_affordance_dist(pred_hand.reshape(-1, 2), r_contact, future_valid)
    l_dist = traj_affordance_dist(pred_hand.reshape(-1, 2), l_contact, future_valid)
    sel = jnp.argmin(jnp.stack([r_dist, l_dist], axis=1), axis=1)
    contact = jnp.take_along_axis(pred_contact, sel[:, None, None], axis=1)[:, 0]
    return pred_hand, contact


def hoi_forecast_loss(
    params, cfg: ObjectTransformerConfig, batch: Dict, rng: jax.Array,
    lambda_obj=0.1, lambda_traj=1.0, lambda_obj_kl=1e-3, lambda_traj_kl=1e-3,
    lambda_last_hand=1e-3,
) -> Tuple[jnp.ndarray, Dict]:
    """HoiForecastModel.forward training composition (build_model.py:18-71)."""
    losses = object_transformer_forward(
        params, cfg, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
        batch["future_hands"], batch["contact_point"], batch["future_valid"],
        rng,
    )
    out = {
        "traj_loss": lambda_traj * losses["traj_loss"].sum(),
        "traj_kl_loss": lambda_traj_kl * losses["traj_kl_loss"].sum(),
        "obj_loss": lambda_obj * losses["obj_loss"].sum(),
        "obj_kl_loss": lambda_obj_kl * losses["obj_kl_loss"].sum(),
        "last_hand_loss": lambda_last_hand * losses["last_hand_loss"].sum(),
    }
    total = sum(out.values())
    out["total_loss"] = total
    return total, out


def hoi_forecast_sample(params, cfg: ObjectTransformerConfig, batch: Dict, rng: jax.Array, num_samples: int = 5, pred_len: int = 4):
    """Multi-sample stochastic inference (build_model.py:72-87):
    returns (future_hands (B,S,2,T,2), contacts (B,S,2))."""
    def one(r):
        return object_transformer_inference(
            params, cfg, batch["feat"], batch["bbox_feat"], batch["valid_mask"],
            batch["future_valid"], r, pred_len,
        )
    hands, contacts = jax.vmap(one)(jax.random.split(rng, num_samples))
    return jnp.swapaxes(hands, 0, 1), jnp.swapaxes(contacts, 0, 1)
