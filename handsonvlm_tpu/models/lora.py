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
from jax.ad_checkpoint import checkpoint_name

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
    else:
        a, b = ad["a"], ad["b"]
    # named for the save_lora remat policy (llama._remat): the (..., r)
    # first-stage output is tiny, saving it halves the adapter ops the
    # backward recompute re-issues
    u = checkpoint_name(x @ a, "lora_u")
    return ((u @ b) * scale).astype(x.dtype)


def lora_delta_multi(
    lora_layer: Optional[Dict],
    names: Sequence[str],
    x: jnp.ndarray,
    scale: float,
):
    """Deltas for several targets sharing the SAME input x.

    Returns 0.0 (nothing targeted), a single concatenated delta
    (..., sum(dout)) the caller adds to a fused base projection in one
    full-width add, or a tuple of per-target deltas (output widths
    differ / partial targeting / grouping disabled). Callers must handle
    all three — `isinstance(d, tuple)` then `d is 0.0`.

    HANDSONVLM_LORA_GROUPED selects the layout (A/B knob; read at trace
    time): "0" = split per-target dots (DEFAULT — the full grouped path
    measured 299 vs 273 ms/step at 7B int8 QLoRA, docs/PERF_NOTES.md
    round 4), "1" = fully grouped (concat-A GEMM + batched second dot +
    one full-width add), "first" = group only the first-stage dots, keep
    split second dots/adds."""
    if lora_layer is None or not any(n in lora_layer for n in names):
        return 0.0
    mode = _os.environ.get("HANDSONVLM_LORA_GROUPED", "0")
    if mode not in ("1", "first") or any(n not in lora_layer for n in names):
        return tuple(lora_delta(lora_layer, n, x, scale) for n in names)
    return _lora_delta_grouped(lora_layer, names, x, scale,
                               first_only=mode == "first")


def _lora_delta_grouped(
    lora_layer: Dict,
    names: Sequence[str],
    x: jnp.ndarray,
    scale: float,
    first_only: bool = False,
):
    """Grouped low-rank path for targets sharing the SAME input x.

    The split path issues 2 dots per target (14 per decoder layer at the
    default 7 targets), each a sub-MXU (r=128) GEMM interleaved with the
    base GEMMs — measured as a ~46 ms/step scheduling/HBM tax at 7B QLoRA
    that is dtype-INsensitive, i.e. not dot compute
    (docs/PERF_NOTES.md "Adapter-tax follow-ups"). Grouping the
    shared-input targets (wq/wk/wv on the attention input, w_gate/w_up on
    the MLP input) fuses their first dots into ONE x @ [A_1|...|A_n] GEMM
    and their second dots into ONE batched dot_general, and — when the
    output widths match — returns a single concatenated delta the caller
    adds to the fused base projection in one full-width add.

    Reductions are unchanged per target (the concat/stack touch only
    non-contracted dims), so this is numerically the split path modulo
    XLA tiling. Returns the concatenated delta (..., sum(dout)) or a
    tuple of per-target deltas when widths differ or first_only (group
    the shared first-stage dot, keep split second dots/adds).

    MEASURED (7B int8 base, r=128, remat=full, same-process A/B): fully
    grouped is a ~26 ms/step REGRESSION vs split (299 vs 273 ms) — the
    per-layer concat/stack materializations under the scan + remat
    recompute outweigh the dot-count saving, so split stays the default
    (docs/PERF_NOTES.md round 4 "Adapter-tax").
    """
    ads = [lora_layer[n] for n in names]
    r = ads[0]["a"].shape[-1]
    douts = [ad["b"].shape[-1] for ad in ads]
    a_cat = jnp.concatenate([ad["a"] for ad in ads], axis=-1)  # (din, n*r)
    compute_bf16 = LORA_COMPUTE_BF16 and x.dtype == jnp.bfloat16
    if compute_bf16:
        a_cat = a_cat.astype(jnp.bfloat16)
    # (..., n*r): one MXU dot for all first stages
    u = checkpoint_name(x @ a_cat, "lora_u")
    if not first_only and len(set(douts)) == 1:
        b_stk = jnp.stack([ad["b"] for ad in ads])  # (n, r, dout)
        if compute_bf16:
            b_stk = b_stk.astype(jnp.bfloat16)
        un = u.reshape(*u.shape[:-1], len(ads), r)
        # batch-dim dot_general: n independent (r -> dout) contractions
        d = jnp.einsum("...nr,nro->...no", un, b_stk)
        d = d.reshape(*u.shape[:-1], len(ads) * douts[0])
        return (d * scale).astype(x.dtype)
    parts = []
    for i, ad in enumerate(ads):
        b_i = ad["b"].astype(jnp.bfloat16) if compute_bf16 else ad["b"]
        parts.append(
            ((u[..., i * r:(i + 1) * r] @ b_i) * scale).astype(x.dtype))
    return tuple(parts)


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
