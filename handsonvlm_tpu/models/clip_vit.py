"""CLIP ViT vision tower (frozen CLIP ViT-L/14 in the reference).

Re-design of `CLIPVisionTower` (llava/model/multimodal_encoder/
clip_encoder.py:7-80): penultimate-layer hidden states (`select_layer=-2`),
patch features only (CLS dropped). The tower is frozen in all reference
recipes, so the forward is wrapped in `stop_gradient`.

TPU notes: the patch embedding runs as a single conv (maps to MXU); all
(B*T) frames of a video batch are encoded in one batched call; layers run
under `lax.scan` over stacked params.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import ClipVisionConfig
from handsonvlm_tpu.ops.attention import attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x, scale, bias, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def init_clip_vision(rng: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32):
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    p = cfg.patch_size
    n_pos = cfg.num_patches + 1
    keys = jax.random.split(rng, 12)

    def norm(key, shape, scale=0.02):
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    def lin(key, din, dout):
        k1, k2 = jax.random.split(key)
        return {"kernel": norm(k1, (L, din, dout)), "bias": jnp.zeros((L, dout), dtype)}

    def ln():
        return {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)}

    return {
        "patch_embed": {"kernel": norm(keys[0], (p, p, 3, d))},
        "class_embed": norm(keys[1], (d,)),
        "pos_embed": norm(keys[2], (n_pos, d)),
        "pre_norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "layers": {
            "ln1": ln(),
            "ln2": ln(),
            "attn": {
                "wq": lin(keys[3], d, d),
                "wk": lin(keys[4], d, d),
                "wv": lin(keys[5], d, d),
                "wo": lin(keys[6], d, d),
            },
            "mlp": {"fc1": lin(keys[7], d, f), "fc2": lin(keys[8], f, d)},
        },
    }


def _encoder_layer(hidden, lp, cfg: ClipVisionConfig, attn_impl: str):
    b, t, d = hidden.shape
    h = cfg.num_heads

    x = layer_norm(hidden, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    q = (x @ lp["attn"]["wq"]["kernel"] + lp["attn"]["wq"]["bias"]).reshape(b, t, h, d // h)
    k = (x @ lp["attn"]["wk"]["kernel"] + lp["attn"]["wk"]["bias"]).reshape(b, t, h, d // h)
    v = (x @ lp["attn"]["wv"]["kernel"] + lp["attn"]["wv"]["bias"]).reshape(b, t, h, d // h)
    out = attention(q, k, v, causal=False, impl=attn_impl).reshape(b, t, d)
    hidden = hidden + out @ lp["attn"]["wo"]["kernel"] + lp["attn"]["wo"]["bias"]

    x = layer_norm(hidden, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    x = quick_gelu(x @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
    hidden = hidden + x @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
    return hidden


def apply_clip_vision(
    params,
    cfg: ClipVisionConfig,
    pixel_values: jnp.ndarray,
    *,
    attn_impl: str = "auto",
    frozen: bool = True,
) -> jnp.ndarray:
    """Encode images -> patch features.

    pixel_values: (B, 3, H, W) CLIP-normalized (channels-first like the
    reference's CLIPImageProcessor output). Returns (B, num_patches, D):
    hidden states of layer `num_layers + select_layer + 1` with the CLS
    token dropped (select_feature='patch').
    """
    b = pixel_values.shape[0]
    d = cfg.hidden_size
    x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(params["patch_embed"]["kernel"].dtype)
    # patch conv: (B,H,W,3) -> (B,g,g,D)
    x = jax.lax.conv_general_dilated(
        x,
        params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(b, cfg.num_patches, d)
    cls = jnp.broadcast_to(params["class_embed"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None].astype(x.dtype)
    x = layer_norm(x, params["pre_norm"]["scale"], params["pre_norm"]["bias"], cfg.layer_norm_eps)

    # hidden_states[-2] == output of the first (L-1) layers for select_layer=-2
    n_run = cfg.num_layers + cfg.select_layer + 1
    lp = jax.tree_util.tree_map(lambda a: a[:n_run], params["layers"])

    def body(hidden, layer_p):
        return _encoder_layer(hidden, layer_p, cfg, attn_impl), None

    x, _ = jax.lax.scan(body, x, lp)

    if cfg.select_feature == "patch":
        x = x[:, 1:]
    if frozen:
        x = jax.lax.stop_gradient(x)
    return x


# CLIP image normalization constants (CLIPImageProcessor defaults used by the
# reference's `image_processor(images)` calls).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(images_uint8: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B,H,W,3) uint8 -> (B,3,size,size) CLIP-normalized float32.

    Device-side replacement for the host PIL pipeline: bicubic-free resize
    (jax.image bilinear matches CLIPImageProcessor closely enough for
    training; exact eval parity uses the host pipeline in data/video_io.py).
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), method="bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    x = (x - mean) / std
    return jnp.transpose(x, (0, 3, 1, 2))
