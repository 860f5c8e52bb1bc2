"""Jitted SFT train step (FSDP over the mesh, remat, metric aux outputs).

Replaces the reference's DeepSpeed/HF Trainer step (handsonvlm_trainer.py +
zero3.json): one `jax.jit` whose parameters and optimizer state carry
NamedShardings (XLA inserts the ZeRO-3-equivalent all-gather/reduce-scatter
collectives), gradients rematerialised through the decoder scan.

Metrics are returned as an aux dict instead of the reference's
wandb-log-inside-forward + barrier pattern (handsonvlm.py:195-198), which
would force host sync every step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from handsonvlm_tpu.core.config import HandsOnVLMConfig
from handsonvlm_tpu.models.handsonvlm import forward
from handsonvlm_tpu.train.train_state import TrainState


def loss_fn(params, cfg: HandsOnVLMConfig, batch: Dict[str, jnp.ndarray], rng, attn_impl: str,
            seq_mesh=None, remat=True):
    out = forward(
        params,
        cfg,
        input_ids=batch["input_ids"],
        attn_mask=batch["attn_mask"],
        images=batch["image"],
        labels=batch["labels"],
        future_hands=batch["future_hands"],
        future_valid=batch["future_valid"],
        rng=rng,
        attn_impl=attn_impl,
        remat=remat,
        seq_mesh=seq_mesh,
    )
    metrics = {
        "loss": out["loss"],
        "text_loss": out["text_loss"],
        "traj_loss": out["traj_loss"],
        "traj_kl_loss": out["traj_kl_loss"],
    }
    return out["loss"], metrics


def _apply_updates(params, updates):
    """optax.apply_updates that leaves float0-update leaves untouched —
    QLoRA's frozen int8-packed decoder leaves have float0 cotangents, and
    float0 supports no arithmetic by design."""
    return jax.tree_util.tree_map(
        lambda p, u: p if getattr(u, 'dtype', None) == jax.dtypes.float0
        else (p + u).astype(jnp.asarray(p).dtype),
        params, updates,
    )


def _grad_norm(grads):
    """optax.global_norm over the real-valued leaves only."""
    leaves = [
        g for g in jax.tree_util.tree_leaves(grads)
        if getattr(g, 'dtype', None) != jax.dtypes.float0
    ]
    return optax.global_norm(leaves)


def make_train_step(cfg: HandsOnVLMConfig, tx: optax.GradientTransformation, attn_impl: str = "auto",
                    seq_mesh=None, remat=True):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    With ``seq_mesh`` (a mesh containing a 'seq' axis) the decoder
    attention runs sequence-parallel ring attention — activations shard on
    T across 'seq' and context length stops being bounded by one device
    (parallel/ring_attention.py; the reference caps context at 2048)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)
        # allow_int: QLoRA params contain frozen int8-packed decoder leaves
        # whose cotangents are float0 (ops/int8_matmul custom VJPs);
        # optax.set_to_zero + apply_updates pass them through untouched
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True
        )(state.params, cfg, batch, step_rng, attn_impl, seq_mesh, remat)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = _apply_updates(state.params, updates)
        metrics["grad_norm"] = _grad_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: HandsOnVLMConfig, attn_impl: str = "auto"):
    """Teacher-forced eval loss (no optimizer)."""

    @jax.jit
    def eval_step(params, batch, rng):
        _, metrics = loss_fn(params, cfg, batch, rng, attn_impl)
        return metrics

    return eval_step
