"""HF/PyTorch checkpoint -> JAX pytree conversion.

Replaces the reference's `load_pretrained_model` restore path
(handsonvlm/model/builder.py:18-159): released HandsOnVLM checkpoints are HF
sharded safetensors of the full `HandsOnVLMForCausalLM` (Vicuna decoder +
CLIP tower + mm_projector + CVAE head + resized 32101-row embeddings,
traj_decoder forced to 'CVAE' at builder.py:91). This module maps those
state-dict names onto the framework's param trees.

Works from either a live torch ``state_dict`` (tests build tiny HF models
in-process) or a directory of ``*.safetensors`` / ``pytorch_model*.bin``.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from handsonvlm_tpu.core.config import (
    ClipVisionConfig,
    HandsOnVLMConfig,
    LlamaConfig,
    TrajDecoderConfig,
)


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (fp32 for bf16 sources)."""
    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a (possibly sharded) HF checkpoint directory into numpy."""
    sd: Dict[str, np.ndarray] = {}
    safes = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if safes:
        from safetensors.numpy import load_file

        for f in safes:
            sd.update(load_file(f))
        return sd
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bins:
        raise FileNotFoundError(f"no checkpoint shards under {path}")
    import torch

    for f in bins:
        part = torch.load(f, map_location="cpu", weights_only=True)
        sd.update({k: _np(v) for k, v in part.items()})
    return sd


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int, transpose=False, dtype=None):
    mats = []
    for i in range(n):
        w = _np(sd[fmt.format(i=i)])
        mats.append(w.T if transpose else w)
    out = np.stack(mats, axis=0)
    return jnp.asarray(out, dtype)


def convert_llama(sd: Mapping[str, np.ndarray], cfg: LlamaConfig, dtype=jnp.float32, prefix: str = "model."):
    """HF LlamaForCausalLM state dict -> framework llama param tree.

    HF stores Linear weights as (out, in); the framework uses (in, out) so
    every projection is transposed. Per-layer weights stack on a leading L
    axis for the `lax.scan` block stack.
    """
    L = cfg.num_layers
    p = prefix

    def pad_vocab(w: np.ndarray, axis: int) -> np.ndarray:
        """Zero-pad the vocab dim to cfg.padded_vocab_size (sharding layout;
        pad logits are masked in lm_logits, pad rows never gathered)."""
        extra = cfg.padded_vocab_size - w.shape[axis]
        if extra <= 0:
            return w
        widths = [(0, 0)] * w.ndim
        widths[axis] = (0, extra)
        return np.pad(w, widths)

    params = {
        "embed": {"weight": jnp.asarray(
            pad_vocab(_np(sd[p + "embed_tokens.weight"]), 0), dtype)},
        "layers": {
            "attn": {
                "wq": _stack(sd, p + "layers.{i}.self_attn.q_proj.weight", L, True, dtype),
                "wk": _stack(sd, p + "layers.{i}.self_attn.k_proj.weight", L, True, dtype),
                "wv": _stack(sd, p + "layers.{i}.self_attn.v_proj.weight", L, True, dtype),
                "wo": _stack(sd, p + "layers.{i}.self_attn.o_proj.weight", L, True, dtype),
            },
            "mlp": {
                "w_gate": _stack(sd, p + "layers.{i}.mlp.gate_proj.weight", L, True, dtype),
                "w_up": _stack(sd, p + "layers.{i}.mlp.up_proj.weight", L, True, dtype),
                "w_down": _stack(sd, p + "layers.{i}.mlp.down_proj.weight", L, True, dtype),
            },
            "attn_norm": {
                "scale": _stack(sd, p + "layers.{i}.input_layernorm.weight", L, False, dtype)
            },
            "mlp_norm": {
                "scale": _stack(sd, p + "layers.{i}.post_attention_layernorm.weight", L, False, dtype)
            },
        },
        "final_norm": {"scale": jnp.asarray(_np(sd[p + "norm.weight"]), dtype)},
    }
    lm_key = "lm_head.weight"
    if lm_key in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": jnp.asarray(
            pad_vocab(_np(sd[lm_key]).T, 1), dtype)}
    return params


def convert_clip_vision(sd: Mapping[str, np.ndarray], cfg: ClipVisionConfig, dtype=jnp.float32, prefix: str = "vision_model."):
    """HF CLIPVisionModel state dict -> framework clip param tree."""
    p = prefix
    L = cfg.num_layers

    def t(name):
        return jnp.asarray(_np(sd[p + name]), dtype)

    def lin(fmt, transpose=True):
        w = _stack(sd, p + fmt + ".weight", L, transpose, dtype)
        b = _stack(sd, p + fmt + ".bias", L, False, dtype)
        return {"kernel": w, "bias": b}

    def ln(fmt):
        return {
            "scale": _stack(sd, p + fmt + ".weight", L, False, dtype),
            "bias": _stack(sd, p + fmt + ".bias", L, False, dtype),
        }

    # patch conv: HF (out, in, kh, kw) -> (kh, kw, in, out)
    patch = _np(sd[p + "embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
    params = {
        "patch_embed": {"kernel": jnp.asarray(patch, dtype)},
        "class_embed": t("embeddings.class_embedding"),
        "pos_embed": t("embeddings.position_embedding.weight"),
        "pre_norm": {
            "scale": t("pre_layrnorm.weight"),
            "bias": t("pre_layrnorm.bias"),
        },
        "layers": {
            "ln1": ln("encoder.layers.{i}.layer_norm1"),
            "ln2": ln("encoder.layers.{i}.layer_norm2"),
            "attn": {
                "wq": lin("encoder.layers.{i}.self_attn.q_proj"),
                "wk": lin("encoder.layers.{i}.self_attn.k_proj"),
                "wv": lin("encoder.layers.{i}.self_attn.v_proj"),
                "wo": lin("encoder.layers.{i}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": lin("encoder.layers.{i}.mlp.fc1"),
                "fc2": lin("encoder.layers.{i}.mlp.fc2"),
            },
        },
    }
    return params


def convert_projector(sd: Mapping[str, np.ndarray], dtype=jnp.float32, key: str = "model.mm_projector"):
    """Linear mm_projector (llava/model/llava_arch.py:33)."""
    return {
        "kernel": jnp.asarray(_np(sd[key + ".weight"]).T, dtype),
        "bias": jnp.asarray(_np(sd[key + ".bias"]), dtype),
    }


def _seq_linear(sd, name, dtype, bias=True):
    out = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
    if bias and name + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
    return out


def convert_traj_cvae(sd: Mapping[str, np.ndarray], cfg: TrajDecoderConfig, dtype=jnp.float32, prefix: str = "hand_traj_decoder.hand_traj_decoder."):
    """CVAE head (hoi_forecast/architecture/{traj_decoder,decoder_modules}.py).

    HF names under the HandsOnVLM checkpoint:
      hand_traj_decoder.hand_traj_decoder.cvae.enc_MLP.0, linear_means,
      linear_log_var, dec_MLP.0, dec_MLP.2
    """
    p = prefix + "cvae."
    return {
        "enc": _seq_linear(sd, p + "enc_MLP.0", dtype),
        "mean": _seq_linear(sd, p + "linear_means", dtype),
        "log_var": _seq_linear(sd, p + "linear_log_var", dtype),
        "dec1": _seq_linear(sd, p + "dec_MLP.0", dtype),
        "dec2": _seq_linear(sd, p + "dec_MLP.2", dtype),
    }


def convert_handsonvlm(sd: Mapping[str, np.ndarray], cfg: HandsOnVLMConfig, dtype=jnp.float32):
    """Full HandsOnVLM checkpoint -> framework param tree.

    Checkpoint layout per reference builder (handsonvlm/model/builder.py):
      model.* (llama), model.vision_tower.vision_tower.vision_model.* (CLIP),
      model.mm_projector.*, lm_head.weight, hand_traj_decoder.*.
    """
    llama_sd = {
        k: v for k, v in sd.items() if not k.startswith("model.vision_tower")
    }
    params = {
        "llama": convert_llama(llama_sd, cfg.llama, dtype),
        "projector": convert_projector(sd, dtype),
        "traj": convert_traj_cvae(sd, cfg.traj, dtype),
    }
    vis_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(vis_prefix) for k in sd):
        params["vision"] = convert_clip_vision(sd, cfg.vision, dtype, vis_prefix)
    return params
