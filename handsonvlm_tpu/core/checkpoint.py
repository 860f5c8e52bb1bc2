"""Orbax checkpointing: async save/restore of the sharded train state.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-3 checkpoint stack
(scripts/finetune.sh save_strategy epoch, zero3.json 16-bit gather-on-save,
train.py:399-402 auto-resume): Orbax writes each shard from its owning
device — no gather — and restores directly into the target shardings.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _manager(ckpt_dir: str, max_to_keep: int = 100):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        ),
    )


def save_train_state(ckpt_dir: str, state, step: int, max_to_keep: int = 100) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave({
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, template_state, step: Optional[int] = None):
    """Restore into the template's shapes/dtypes/shardings (auto-resume)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    target = {
        "step": template_state.step,
        "params": template_state.params,
        "opt_state": template_state.opt_state,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    return type(template_state)(
        step=restored["step"], params=restored["params"], opt_state=restored["opt_state"]
    )


def save_params(ckpt_dir: str, params: Any) -> None:
    """Params-only export (deploy artifact, analogous to the 16-bit
    gathered model save)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(ckpt_dir), "params"), params)
    ckptr.wait_until_finished()


def save_artifact(out_dir: str, name: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Save a partial-parameter artifact (adapter-style checkpoint).

    Reference equivalents: `mm_projector.bin` adapter-only saves
    (handsonvlm/train/train.py:104-122) and LoRA `non_lora_trainables.bin`
    (train.py:407-413). `meta` lands in `<out_dir>/<name>.json` (e.g. the
    base-model path, mirroring config.mm_projector bookkeeping)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(out_dir), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def restore_artifact(out_dir: str, name: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(out_dir), name)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template) if template is not None else ckptr.restore(path)


def has_artifact(out_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(os.path.abspath(out_dir), name))


def is_params_export(ckpt_dir: str) -> bool:
    """True for a save_params export dir (<dir>/params orbax tree)."""
    return os.path.exists(
        os.path.join(ckpt_dir, "params", "_CHECKPOINT_METADATA")
    )


def is_trainer_output(ckpt_dir: str) -> bool:
    """True for a trainer --output-dir (<dir>/checkpoints/<step> states)."""
    return latest_step(os.path.join(ckpt_dir, "checkpoints")) is not None


def _restore_params_subtree(path: str) -> Any:
    """Restore ONLY the params subtree of a saved train state: the Adam
    moments are ~2x the params bytes (tens of GB at 7B), and reading them
    just to drop them triples restore I/O and host RAM for eval/serve."""
    import orbax.checkpoint as ocp

    pt = ocp.PyTreeCheckpointer()
    try:
        meta = pt.metadata(path)
        tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") else meta.tree
        item = jax.tree_util.tree_map(lambda m: ocp.RestoreArgs(), tree["params"])
        restored = pt.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item={"params": item}, partial_restore=True
            ),
        )
        return restored["params"]
    except Exception as e:  # orbax API drift: fall back to the full-state read
        logging.getLogger(__name__).warning(
            "partial params restore failed (%s: %s); falling back to the "
            "full train-state read — ~3x restore I/O and host RAM at 7B",
            type(e).__name__, e,
        )
        return ocp.StandardCheckpointer().restore(path)["params"]


def restore_params(ckpt_dir: str, cfg=None, dtype=None) -> Any:
    """Params from a save_params export or a trainer output dir (the latest
    train-state checkpoint's params subtree)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if is_params_export(ckpt_dir):
        path = os.path.join(os.path.abspath(ckpt_dir), "params")
        params = ckptr.restore(path)
    else:
        cdir = os.path.join(os.path.abspath(ckpt_dir), "checkpoints")
        step = latest_step(cdir)
        if step is None:
            raise ValueError(f"no params export or checkpoints in {ckpt_dir}")
        path = os.path.join(cdir, str(step), "default")
        params = _restore_params_subtree(path)
    if dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") and np.issubdtype(x.dtype, np.floating) else x,
            params,
        )
    return params
