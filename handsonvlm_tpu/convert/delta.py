"""Weight-delta and consolidation tools over JAX param trees.

TPU-native equivalents of the reference's distribution tooling
(`llava/model/make_delta.py`, `llava/model/apply_delta.py`,
`llava/model/consolidate.py`): LLaVA/Vicuna weights are distributed as
*deltas* against the base LLaMA for licensing reasons; consolidate re-saves
a sharded checkpoint as a single artifact.

Semantics mirror the reference exactly:
- ``make_delta`` = target − base per leaf (apply_delta.py:24-33 inverse);
- leaves missing from the base (projector, traj head, vision tower) are
  carried verbatim — the reference whitelists `mm_projector.*`
  (make_delta.py:25-27); here any non-LLaMA subtree qualifies;
- resized embeddings (target vocab 32101+pad vs base 32000) subtract/add
  only the overlapping top-left corner (apply_delta.py:29-33): rows added
  by tokenizer surgery ride along at full value;
- ``consolidate`` = load any supported checkpoint layout, save as one
  orbax params artifact (reference consolidate.py:13-19 re-save).

Trees are the orbax layouts produced by core/checkpoint.save_params or
convert/hf_to_jax.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flat(tree: Any) -> Dict[Tuple, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {tuple(str(k) for k in path): np.asarray(v) for path, v in leaves}


def _corner_op(t: np.ndarray, b: np.ndarray, op) -> np.ndarray:
    """Apply op on the overlapping top-left corner (resized embed/lm_head,
    apply_delta.py:29-33)."""
    out = np.array(t)
    sl = tuple(slice(0, min(ts, bs)) for ts, bs in zip(t.shape, b.shape))
    out[sl] = op(t[sl], b[sl])
    return out


def _combine(target_tree: Any, base_tree: Any, op) -> Any:
    base = _flat(base_tree)

    def visit(path, t):
        key = tuple(str(k) for k in path)
        b = base.get(key)
        if b is None:
            return t  # not in base (projector/traj/vision): carried verbatim
        t_np = np.asarray(t)
        if t_np.shape == b.shape:
            return op(t_np.astype(np.float32), b.astype(np.float32)).astype(t_np.dtype)
        if t_np.ndim != b.ndim:
            raise ValueError(f"{key}: rank mismatch {t_np.shape} vs {b.shape}")
        return _corner_op(
            t_np.astype(np.float32), b.astype(np.float32), op
        ).astype(t_np.dtype)

    return jax.tree_util.tree_map_with_path(visit, target_tree)


def make_delta(target: Any, base: Any) -> Any:
    """delta = target − base (leaf-wise; corner rule for resized vocab)."""
    return _combine(target, base, lambda t, b: t - b)


def apply_delta(delta: Any, base: Any) -> Any:
    """target = delta + base — exact inverse of make_delta."""
    return _combine(delta, base, lambda t, b: t + b)


def consolidate(src_dir: str, dst_dir: str, preset: str = "7b"):
    """Re-save any supported checkpoint layout (orbax train state, params
    artifact, HF safetensors dir) as a single orbax params artifact."""
    from handsonvlm_tpu.core.checkpoint import save_params
    from handsonvlm_tpu.infer.builder import load_pretrained_model

    params, cfg, _tok = load_pretrained_model(src_dir, preset)
    save_params(dst_dir, params)
    return cfg


def main():
    import argparse

    from handsonvlm_tpu.core.checkpoint import restore_params, save_params

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("make-delta", "apply-delta"):
        sp = sub.add_parser(cmd)
        sp.add_argument("--base", required=True, help="base params dir (orbax)")
        sp.add_argument("--src", required=True,
                        help="target model dir (make) / delta dir (apply)")
        sp.add_argument("--out", required=True)
    sp = sub.add_parser("consolidate")
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)
    sp.add_argument("--preset", default="7b")
    args = p.parse_args()

    if args.cmd == "consolidate":
        consolidate(args.src, args.dst, args.preset)
        return
    base = restore_params(args.base)
    src = restore_params(args.src)
    fn = make_delta if args.cmd == "make-delta" else apply_delta
    save_params(args.out, fn(src, base))


if __name__ == "__main__":
    main()
