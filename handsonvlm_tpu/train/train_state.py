"""Train state, optimizer and LR schedule.

Recipe semantics from the reference (scripts/finetune.sh): AdamW, lr 2e-5,
weight_decay 0, cosine schedule with 3% warmup; CLIP tower frozen. Parameter
and optimizer-state sharding over the ('data','model') mesh replaces
DeepSpeed ZeRO-3 (scripts/zero3.json) — see parallel/partition.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from handsonvlm_tpu.core.config import HandsOnVLMConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def cosine_schedule(
    base_lr: float, total_steps: int, warmup_ratio: float = 0.03
) -> optax.Schedule:
    """HF 'cosine' scheduler with linear warmup (finetune.sh:--lr_scheduler_type)."""
    warmup_steps = max(int(total_steps * warmup_ratio), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup_steps),
            optax.cosine_decay_schedule(base_lr, max(total_steps - warmup_steps, 1)),
        ],
        [warmup_steps],
    )


def _trainable_mask(params, freeze_top_keys=("vision",)) -> Any:
    """Freeze whole top-level subtrees. Default freezes only the CLIP tower
    (reference trains everything else); LoRA runs freeze ('vision','llama')
    so just adapters + projector + traj head move (reference train.py
    lora_enable path)."""

    def mask(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if top == "lora" and last == "scale":
            return "freeze"  # alpha/r is a constant, not a parameter
        return "freeze" if top in freeze_top_keys else "train"

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(
    learning_rate: float | optax.Schedule = 2e-5,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    params_template=None,
    freeze_top_keys=("vision",),
    mu_dtype=None,
) -> optax.GradientTransformation:
    """`mu_dtype` (e.g. jnp.bfloat16) halves the first-moment memory —
    with QLoRA it is what fits 13B LoRA r=128 on a 16 GB chip."""
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm else optax.identity(),
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
    if params_template is not None:
        # multi_transform with set_to_zero: frozen leaves get ZERO updates.
        # (optax.masked would pass their raw gradients through as updates —
        # only harmless when the gradient is exactly zero.)
        labels = _trainable_mask(params_template, freeze_top_keys)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )
