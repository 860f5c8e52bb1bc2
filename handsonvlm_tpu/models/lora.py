"""LoRA adapters for the LLaMA decoder.

Reference feature: `--lora_enable` fine-tuning with r=128/alpha=256 over all
decoder linear layers (handsonvlm/train/train.py:216-231,407-413, LoRA
checkpoints as `non_lora_trainables.bin`). Here adapters are a separate
stacked pytree applied inside the layer computation — low-rank activations
paths, never materialising merged weights — plus a merge utility for export.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import LlamaConfig

import os as _os

# bf16 adapter compute (master weights stay f32) — see lora_delta
LORA_COMPUTE_BF16 = _os.environ.get("HANDSONVLM_LORA_BF16", "0") == "1"

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

_SHAPES = {
    "wq": ("d", "qh"), "wk": ("d", "kh"), "wv": ("d", "kh"), "wo": ("qh", "d"),
    "w_gate": ("d", "f"), "w_up": ("d", "f"), "w_down": ("f", "d"),
}


def _dims(cfg: LlamaConfig):
    return {
        "d": cfg.hidden_size,
        "f": cfg.intermediate_size,
        "qh": cfg.num_heads * cfg.head_dim_,
        "kh": cfg.kv_heads * cfg.head_dim_,
    }


def init_lora(
    rng: jax.Array,
    cfg: LlamaConfig,
    r: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """A ~ N(0, 0.02), B = 0 (standard LoRA init: adapter starts as no-op)."""
    dims = _dims(cfg)
    L = cfg.num_layers
    adapters = {}
    for i, t in enumerate(targets):
        din, dout = (dims[x] for x in _SHAPES[t])
        k = jax.random.fold_in(rng, i)
        adapters[t] = {
            "a": (jax.random.normal(k, (L, din, r)) * 0.02).astype(dtype),
            "b": jnp.zeros((L, r, dout), dtype),
        }
    # scale is a () array so the tree is uniform for sharding/optax;
    # the optimizer mask excludes it from updates
    return {"adapters": adapters, "scale": jnp.asarray(float(alpha) / float(r), jnp.float32)}


def lora_delta(lora_layer: Optional[Dict], name: str, x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Low-rank activation path: (x @ A) @ B * (alpha/r); 0 if untargeted.

    The delta is computed in the adapter dtype (f32 during training) and
    cast back to the activation dtype — f32 adapters must not promote the
    bf16 residual stream (the decoder scan carry is dtype-strict).

    With LORA_COMPUTE_BF16 (env HANDSONVLM_LORA_BF16=1, trainer
    --lora-bf16) the two adapter matmuls run in bf16 with the f32 MASTER
    adapters cast per use: at r=128 the adapter path is ~6% of the base
    projection FLOPs, and f32 MXU throughput is a fraction of bf16's, so
    f32 adapter dots cost a disproportionate slice of the step (the
    round-2 MFU plateau suspect list). Master weights, optimizer state,
    and gradient accumulation stay f32 — only the dot compute dtype
    changes (standard mixed precision; grads flow through the cast)."""
    if lora_layer is None or name not in lora_layer:
        return 0.0
    ad = lora_layer[name]
    if LORA_COMPUTE_BF16 and x.dtype == jnp.bfloat16:
        a = ad["a"].astype(jnp.bfloat16)
        b = ad["b"].astype(jnp.bfloat16)
        return (((x @ a) @ b) * scale).astype(x.dtype)
    return (((x @ ad["a"]) @ ad["b"]) * scale).astype(x.dtype)


def merge_lora(llama_params: Dict, lora: Dict) -> Dict:
    """Fold adapters into the base weights (export / fast inference)."""
    scale = lora["scale"]
    out = jax.tree_util.tree_map(lambda x: x, llama_params)  # shallow copy
    layers = dict(out["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    for t, ad in lora["adapters"].items():
        delta = jnp.einsum("lir,lro->lio", ad["a"], ad["b"]) * scale
        if t in ("wq", "wk", "wv", "wo"):
            attn[t] = attn[t] + delta.astype(attn[t].dtype)
        else:
            mlp[t] = mlp[t] + delta.astype(mlp[t].dtype)
    layers["attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    return out
