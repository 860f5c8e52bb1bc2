"""JAX pytree -> HF state-dict export.

Inverse of convert/hf_to_jax.py: produces the reference checkpoint naming
(HandsOnVLMForCausalLM layout) so models trained here can be loaded by the
reference code or compared tensor-by-tensor. Replaces the reference's
delta/consolidate tooling (llava/model/{apply_delta,make_delta,
consolidate}.py) — with a direct bidirectional converter, weight deltas are
unnecessary.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def export_llama(params, prefix: str = "model.", vocab_size: int = None) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    # strip sharding-layout vocab padding (convert/hf_to_jax.pad_vocab)
    v = vocab_size if vocab_size is not None else params["embed"]["weight"].shape[0]
    sd[prefix + "embed_tokens.weight"] = _np(params["embed"]["weight"][:v])
    L = params["layers"]["attn"]["wq"].shape[0]
    for i in range(L):
        lp = prefix + f"layers.{i}."
        attn = params["layers"]["attn"]
        mlp = params["layers"]["mlp"]
        sd[lp + "self_attn.q_proj.weight"] = _np(attn["wq"][i]).T
        sd[lp + "self_attn.k_proj.weight"] = _np(attn["wk"][i]).T
        sd[lp + "self_attn.v_proj.weight"] = _np(attn["wv"][i]).T
        sd[lp + "self_attn.o_proj.weight"] = _np(attn["wo"][i]).T
        sd[lp + "mlp.gate_proj.weight"] = _np(mlp["w_gate"][i]).T
        sd[lp + "mlp.up_proj.weight"] = _np(mlp["w_up"][i]).T
        sd[lp + "mlp.down_proj.weight"] = _np(mlp["w_down"][i]).T
        sd[lp + "input_layernorm.weight"] = _np(params["layers"]["attn_norm"]["scale"][i])
        sd[lp + "post_attention_layernorm.weight"] = _np(params["layers"]["mlp_norm"]["scale"][i])
    sd[prefix + "norm.weight"] = _np(params["final_norm"]["scale"])
    if "lm_head" in params:
        sd["lm_head.weight"] = _np(params["lm_head"]["weight"][:, :v]).T
    return sd


def export_clip_vision(params, prefix: str = "vision_model.") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "embeddings.patch_embedding.weight"] = _np(
        params["patch_embed"]["kernel"]
    ).transpose(3, 2, 0, 1)
    sd[prefix + "embeddings.class_embedding"] = _np(params["class_embed"])
    sd[prefix + "embeddings.position_embedding.weight"] = _np(params["pos_embed"])
    sd[prefix + "pre_layrnorm.weight"] = _np(params["pre_norm"]["scale"])
    sd[prefix + "pre_layrnorm.bias"] = _np(params["pre_norm"]["bias"])
    L = params["layers"]["ln1"]["scale"].shape[0]
    names = {
        "self_attn.q_proj": ("attn", "wq"), "self_attn.k_proj": ("attn", "wk"),
        "self_attn.v_proj": ("attn", "wv"), "self_attn.out_proj": ("attn", "wo"),
        "mlp.fc1": ("mlp", "fc1"), "mlp.fc2": ("mlp", "fc2"),
    }
    for i in range(L):
        lp = prefix + f"encoder.layers.{i}."
        for hf, (grp, key) in names.items():
            sd[lp + hf + ".weight"] = _np(params["layers"][grp][key]["kernel"][i]).T
            sd[lp + hf + ".bias"] = _np(params["layers"][grp][key]["bias"][i])
        for hf, key in (("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            sd[lp + hf + ".weight"] = _np(params["layers"][key]["scale"][i])
            sd[lp + hf + ".bias"] = _np(params["layers"][key]["bias"][i])
    return sd


def export_handsonvlm(params, vocab_size: int = 32101) -> Dict[str, np.ndarray]:
    sd = export_llama(params["llama"], vocab_size=vocab_size)
    sd["model.mm_projector.weight"] = _np(params["projector"]["kernel"]).T
    sd["model.mm_projector.bias"] = _np(params["projector"]["bias"])
    if "vision" in params:
        sd.update(
            export_clip_vision(
                params["vision"], "model.vision_tower.vision_tower.vision_model."
            )
        )
    cvae = params["traj"]
    p = "hand_traj_decoder.hand_traj_decoder.cvae."
    for hf, key in (
        ("enc_MLP.0", "enc"), ("linear_means", "mean"), ("linear_log_var", "log_var"),
        ("dec_MLP.0", "dec1"), ("dec_MLP.2", "dec2"),
    ):
        sd[p + hf + ".weight"] = _np(cvae[key]["kernel"]).T
        sd[p + hf + ".bias"] = _np(cvae[key]["bias"])
    return sd


def save_hf_checkpoint(params, out_dir: str) -> str:
    """Write a safetensors HF checkpoint the reference builder can load."""
    import os

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = export_handsonvlm(params)
    # safetensors serializes the raw buffer: transposed views must be made
    # contiguous or the file silently holds the untransposed data
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    path = os.path.join(out_dir, "model.safetensors")
    save_file(sd, path)
    return path
