"""Visual-token fusion modes (VisualToTokenHelper pipeline).

Behavioral spec from `hoi_forecast/model/visual_to_tokens.py:7-284` and the
hoi-encoder mixin (`handsonvlm/model/language_model/
lita_llama_hoi_encoder.py:6-28`): alternative vision->LLM adapters fusing
precomputed TSN features (B,5,T,1024) + hand/object bboxes instead of raw
CLIP frames, plus the random/zero/reverse ablations the reference uses as
language-path isolation fixtures (SURVEY.md §4.3).

The shipped HandsOnVLM path is 'origin' (CLIP raw frames, implemented in
models/handsonvlm.encode_video); these modes serve the LITA-HOI model
family and ablation studies.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import HandsOnVLMConfig
from handsonvlm_tpu.models.pooling import pool_video_tokens
from handsonvlm_tpu.models.projector import apply_projector


def init_hoi_encoder(rng: jax.Array, dtype=jnp.float32, coord_dim: int = 64, feat_dim: int = 1024):
    """bbox/feature fusion params (lita_llama_hoi_encoder.py:10-22)."""

    def lin(key, din, dout):
        k1, k2 = jax.random.split(key)
        bound = 1.0 / jnp.sqrt(din)
        return {
            "kernel": jax.random.uniform(k1, (din, dout), minval=-bound, maxval=bound).astype(dtype),
            "bias": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound).astype(dtype),
        }

    ks = jax.random.split(rng, 4)
    return {
        "bbox_to_feature": {
            "fc1": lin(ks[0], 4, coord_dim // 2),
            "fc2": lin(ks[1], coord_dim // 2, coord_dim),
        },
        "feat_fusion": lin(ks[2], feat_dim + coord_dim, feat_dim),
        "downproject": lin(ks[3], feat_dim, feat_dim),
    }


def _apply(p, x):
    return x @ p["kernel"] + p["bias"]


def _bbox_features(hoi_params, bbox: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.elu(_apply(hoi_params["bbox_to_feature"]["fc1"], bbox))
    return jax.nn.elu(_apply(hoi_params["bbox_to_feature"]["fc2"], h))


def fuse_hoi_features(
    hoi_params,
    projector_params,
    mode: str,
    feat: jnp.ndarray,  # (B, 5, T, 1024) global/rhand/lhand/robj/lobj
    bbox_feat: jnp.ndarray,  # (B, 4, T, 4)
    valid_mask: jnp.ndarray,  # (B, 5, T)
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fuse_input for the hoi modes -> (tokens (B,T,S,D), attn (B,T,S)).

    Modes (visual_to_tokens.py:179-227): 'hoi-global', 'clip', 'hoi-hand',
    'hoi' and their '-random'/'-reverse'/zero ablations.
    """
    b, _, t, _ = feat.shape
    base = mode
    for suffix in ("-random-zero-embed-one-attention", "-random", "-reverse"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break

    feat_p = _apply(hoi_params["downproject"], feat)

    if base in ("hoi-global", "clip"):
        tokens = feat_p[:, 0:1].transpose(0, 2, 1, 3)  # (B,T,1,1024)
        tokens = apply_projector(projector_params, tokens)
        attn = valid_mask[:, 0:1].transpose(0, 2, 1).astype(bool)
    elif base == "hoi-hand":
        bb = _bbox_features(hoi_params, bbox_feat[:, :2])  # (B,2,T,64)
        hand = feat_p[:, 1:3]
        fused = jax.nn.elu(
            _apply(hoi_params["feat_fusion"], jnp.concatenate([hand, bb], -1))
        )
        # reference computes the fusion but feeds raw hand feats to the
        # projector (visual_to_tokens.py:114-125); replicated
        del fused
        tokens = jnp.concatenate([feat_p[:, 0:1], hand], axis=1).transpose(0, 2, 1, 3)
        tokens = apply_projector(projector_params, tokens)
        attn = valid_mask[:, 0:3].transpose(0, 2, 1).astype(bool)
    elif base == "hoi":
        bb = _bbox_features(hoi_params, bbox_feat)  # (B,4,T,64)
        ho = feat_p[:, 1:5]
        fused = jax.nn.elu(
            _apply(hoi_params["feat_fusion"], jnp.concatenate([ho, bb], -1))
        )
        tokens = jnp.concatenate([feat_p[:, 0:1], fused], axis=1).transpose(0, 2, 1, 3)
        tokens = apply_projector(projector_params, tokens)
        attn = valid_mask.transpose(0, 2, 1).astype(bool)
    else:
        raise ValueError(f"unknown fuse mode {mode}")

    # ablations
    if mode.endswith("-random-zero-embed-one-attention"):
        tokens = jnp.zeros_like(tokens)
        attn = jnp.ones_like(attn)
    elif mode.endswith("-random"):
        assert rng is not None, "random ablation needs a PRNG key"
        tokens = jax.random.uniform(rng, tokens.shape, tokens.dtype)
    elif mode.endswith("-reverse"):
        attn = ~attn
    return tokens, attn


def visual_pipeline(
    params: Dict,
    cfg: HandsOnVLMConfig,
    *,
    images: Optional[jnp.ndarray] = None,
    feat: Optional[jnp.ndarray] = None,
    bbox_feat: Optional[jnp.ndarray] = None,
    valid_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VisualToTokenHelper.pipeline: fuse_input -> compress_tokens.

    Returns (visual_tokens (B,N,D), attention_mask (B,N)).
    """
    mode = cfg.fuse_input_mode
    if mode == "origin" or mode == "origin-random":
        from handsonvlm_tpu.models.clip_vit import apply_clip_vision

        b, t = images.shape[:2]
        if mode == "origin-random":
            assert rng is not None
            s = cfg.vision.num_patches
            tokens = jax.random.uniform(
                rng, (b, t, s, cfg.llama.hidden_size), images.dtype
            )
        else:
            flat = images.reshape((b * t,) + images.shape[2:])
            feats = apply_clip_vision(params["vision"], cfg.vision, flat, attn_impl=attn_impl)
            tokens = apply_projector(params["projector"], feats)
            tokens = tokens.reshape(b, t, tokens.shape[1], tokens.shape[2])
        attn = jnp.ones(tokens.shape[:-1], bool)
    else:
        tokens, attn = fuse_hoi_features(
            params["hoi_encoder"], params["projector"], mode,
            feat, bbox_feat, valid_mask, rng,
        )

    b, t, s, d = tokens.shape
    compressed = pool_video_tokens(tokens, cfg.video_arch)
    if cfg.video_arch in ("all", "none"):
        out_attn = attn.reshape(b, t * s)
    else:
        # pooled modes return all-ones masks in the reference
        # (visual_to_tokens.py:271)
        out_attn = jnp.ones(compressed.shape[:-1], bool)
    return compressed, out_attn
