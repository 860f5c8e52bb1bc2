"""Parameter partitioning rules (FSDP + optional tensor parallelism).

Rules map parameter-tree paths to `PartitionSpec`s over the ('data','model')
mesh. This is the GSPMD replacement for the reference's DeepSpeed ZeRO-3
stage-3 parameter sharding (scripts/zero3.json:16-27): parameters live
sharded on the `data` axis and XLA all-gathers them on use, reduce-scatters
gradients — no explicit gather code.

Rule syntax: each rule is (path_suffix_regex, PartitionSpec). First match
wins; unmatched params are replicated.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# LLaMA decoder params are stacked over layers (leading L dim) for lax.scan,
# so specs for `layers/...` leaves carry a leading None.
LLAMA_RULES: List[Tuple[str, P]] = [
    # embedding (V, D): FSDP-shard vocab rows, TP-shard features
    (r"embed/weight$", P("data", "model")),
    # attention projections
    (r"layers/attn/wq$", P(None, "data", "model")),
    (r"layers/attn/wk$", P(None, "data", "model")),
    (r"layers/attn/wv$", P(None, "data", "model")),
    (r"layers/attn/wo$", P(None, "model", "data")),
    # SwiGLU MLP
    (r"layers/mlp/w_gate$", P(None, "data", "model")),
    (r"layers/mlp/w_up$", P(None, "data", "model")),
    (r"layers/mlp/w_down$", P(None, "model", "data")),
    # norms: tiny, replicate
    (r"layers/(attn_norm|mlp_norm)/scale$", P(None)),
    (r"final_norm/scale$", P()),
    # lm head (D, V)
    (r"lm_head/weight$", P("data", "model")),
]

VISION_RULES: List[Tuple[str, P]] = [
    (r"vision/.*patch_embed/kernel$", P(None, None, None, "data")),
    (r"vision/.*(wq|wk|wv|fc1)/kernel$", P(None, "data", "model")),
    (r"vision/.*(wo|fc2)/kernel$", P(None, "model", "data")),
    (r"vision/.*(pos_embed|class_embed)$", P()),
    (r"vision/.*bias$", P()),
    (r"vision/.*scale$", P()),
]

LORA_RULES: List[Tuple[str, P]] = [
    # adapters stacked (L, din, r) / (L, r, dout): FSDP-shard the big dim
    (r"lora/adapters/.*/a$", P(None, "data", None)),
    (r"lora/adapters/.*/b$", P(None, None, "data")),
]

HEAD_RULES: List[Tuple[str, P]] = [
    # mm projector (1024, D)
    (r"projector/kernel$", P("data", "model")),
    (r"projector/bias$", P("model")),
    # CVAE head: small MLPs, FSDP only
    (r"traj/.*kernel$", P("data", None)),
    (r"traj/.*bias$", P()),
]

QUANT_RULES: List[Tuple[str, P]] = [
    # int4 fused stacked leaves (L, G, g/2, n): column-parallel over `model`
    # — matches the shard_map layout in parallel/tp.int4_matmul_stacked_tp
    (r"/w4$", P(None, None, None, "model")),
    (r"/gscale$", P(None, None, "model")),
    # tiled int4 layout (L, NB, G, g/2, BN): column tiles over model
    (r"/w4t$", P(None, "model", None, None, None)),
    (r"/gst$", P(None, "model", None, None)),
    # int8 per-projection leaves (L, din, dout): same layout as dense rules
    (r"layers/attn/w[qkv]/w8$", P(None, "data", "model")),
    (r"layers/attn/wo/w8$", P(None, "model", "data")),
    (r"layers/mlp/w_(gate|up)/w8$", P(None, "data", "model")),
    (r"layers/mlp/w_down/w8$", P(None, "model", "data")),
    (r"lm_head/w8$", P("data", "model")),
    # per-output-channel quant scales: small, replicate
    (r"(wq|wk|wv|wo|w_gate|w_up|w_down|lm_head)/scale$", P()),
]

DEFAULT_RULES: List[Tuple[str, P]] = (
    QUANT_RULES + LLAMA_RULES + VISION_RULES + LORA_RULES + HEAD_RULES
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str, rules=None) -> P:
    rules = DEFAULT_RULES if rules is None else rules
    for pat, spec in rules:
        if re.search(pat, path_str):
            return spec
    return P()


def _clamp_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on dims not divisible by the assigned mesh axis size —
    and on axes the mesh doesn't have at all (rules mention 'model', but a
    --seq-parallel mesh is ('data','seq'): those dims stay replicated)."""
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        if isinstance(axis, tuple):
            size = 1
        elif axis not in mesh.shape:
            out.append(None)
            continue
        else:
            size = mesh.shape[axis]
        out.append(axis if size and dim % size == 0 else None)
    return P(*out)


def partition_specs(params: Any, rules=None) -> Any:
    """PartitionSpec pytree matching `params` (abstract or concrete)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), rules), params
    )


def named_shardings(params: Any, mesh: Mesh, rules=None) -> Any:
    """NamedSharding pytree for `params`, clamped to divisible dims."""

    def make(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        spec = _clamp_spec(spec, leaf.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(make, params)


def shard_params(params: Any, mesh: Mesh, rules=None) -> Any:
    """Device-put a concrete param tree onto the mesh per the rules."""
    shardings = named_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
