"""Torch ObjectTransformer state dict -> JAX param tree.

Enables loading hoi-forecast checkpoints (hoi_forecast/model/modelio.py) and
oracle parity tests against the reference architecture code.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from handsonvlm_tpu.core.config import TrajDecoderConfig
from handsonvlm_tpu.models.object_transformer import ObjectTransformerConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def _lin(sd, name, dtype, bias=True):
    p = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
    if bias and name + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
    else:
        p["bias"] = jnp.zeros((p["kernel"].shape[1],), dtype)
    return p


def _lin_nobias_ok(sd, name, dtype):
    p = {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
    if name + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
    return p


def _ln(sd, name, dtype):
    return {
        "scale": jnp.asarray(_np(sd[name + ".weight"]), dtype),
        "bias": jnp.asarray(_np(sd[name + ".bias"]), dtype),
    }


def _mha(sd, prefix, dtype):
    out = {
        "wq": {"kernel": jnp.asarray(_np(sd[prefix + ".proj_q.weight"]).T, dtype)},
        "wk": {"kernel": jnp.asarray(_np(sd[prefix + ".proj_k.weight"]).T, dtype)},
        "wv": {"kernel": jnp.asarray(_np(sd[prefix + ".proj_v.weight"]).T, dtype)},
        "proj": _lin(sd, prefix + ".proj", dtype),
    }
    for k in ("wq", "wk", "wv"):
        bias_name = prefix + ".proj_" + k[-1] + ".bias"
        if bias_name in sd:
            out[k]["bias"] = jnp.asarray(_np(sd[bias_name]), dtype)
    return out


def _cvae(sd, prefix, dtype):
    return {
        "enc": _lin(sd, prefix + ".enc_MLP.0", dtype),
        "mean": _lin(sd, prefix + ".linear_means", dtype),
        "log_var": _lin(sd, prefix + ".linear_log_var", dtype),
        "dec1": _lin(sd, prefix + ".dec_MLP.0", dtype),
        "dec2": _lin(sd, prefix + ".dec_MLP.2", dtype),
    }


def convert_object_transformer(sd: Mapping, cfg: ObjectTransformerConfig, dtype=jnp.float32, prefix: str = ""):
    """Reference ObjectTransformer (object_transformer.py:129-175) weights."""
    p = prefix

    def enc_block(i):
        b = f"{p}oct_encoder.encoder_blocks.{i}"
        return {
            "norm1": _ln(sd, b + ".norm1", dtype),
            "attn": _mha(sd, b + ".attn", dtype),
            "norm2": _ln(sd, b + ".norm2", dtype),
            "mlp": {"fc1": _lin(sd, b + ".mlp.fc1", dtype), "fc2": _lin(sd, b + ".mlp.fc2", dtype)},
        }

    def dec_block(i):
        b = f"{p}oct_decoder.decoder_blocks.{i}"
        return {
            "norm1": _ln(sd, b + ".norm1", dtype),
            "self_attn": _mha(sd, b + ".self_attn", dtype),
            "norm2": _ln(sd, b + ".norm2", dtype),
            "cross_attn": _mha(sd, b + ".enc_dec_attn", dtype),
            "norm3": _ln(sd, b + ".norm3", dtype),
            "mlp": {"fc1": _lin(sd, b + ".mlp.fc1", dtype), "fc2": _lin(sd, b + ".mlp.fc2", dtype)},
        }

    return {
        "downproject": _lin(sd, p + "downproject", dtype),
        "bbox_to_feature": {
            "fc1": _lin(sd, p + "bbox_to_feature.0", dtype),
            "fc2": _lin(sd, p + "bbox_to_feature.2", dtype),
        },
        "feat_fusion": _lin(sd, p + "feat_fusion.0", dtype),
        "encoder": {
            "pos_embed": jnp.asarray(_np(sd[p + "oct_encoder.pos_embed"]), dtype),
            "blocks": [enc_block(i) for i in range(cfg.enc_depth)],
            "norm": _ln(sd, p + "oct_encoder.norm", dtype),
        },
        "decoder": {
            "target_embedding": _lin(sd, p + "oct_decoder.target_embedding", dtype),
            "blocks": [dec_block(i) for i in range(cfg.dec_depth)],
            "norm": _ln(sd, p + "oct_decoder.norm", dtype),
        },
        "last_obs_rhand": _lin(sd, p + "last_obs_rhand_embedding_predictor", dtype),
        "last_obs_lhand": _lin(sd, p + "last_obs_lhand_embedding_predictor", dtype),
        "hand_head": _cvae(sd, p + "hand_head.cvae", dtype),
        "obj_head": {
            "traj_to_feature": _lin_nobias_ok(sd, p + "object_head.traj_to_feature.0", dtype),
            "traj_context_fusion": _lin_nobias_ok(sd, p + "object_head.traj_context_fusion.0", dtype),
            "cvae": _cvae(sd, p + "object_head.cvae", dtype),
        },
    }
