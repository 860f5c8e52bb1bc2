"""Standalone hoi-forecast trainer (secondary workload, SURVEY §3.5).

Replaces `hoi_forecast/model/{trainer,optimizer,epoch_utils,modelio}.py`:
jitted train/eval steps over the ObjectTransformer, warmup-wrapped LR
schedules, the vae/head weight-decay exemption, and stochastic multi-sample
evaluation scored by the swap-preserving ADE/FDE.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from handsonvlm_tpu.eval.traj_metrics import evaluate_traj_stochastic
from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    hoi_forecast_loss,
    hoi_forecast_sample,
)
from handsonvlm_tpu.train.train_state import TrainState, create_train_state


def warmup_schedule(base_lr: float, warmup_iters: int, after: optax.Schedule, init_lr_ratio: float = 0.0) -> optax.Schedule:
    """hoi_forecast Warmup wrapper (optimizer.py:4-34): linear ramp from
    init_lr_ratio*lr over warmup_iters, then the base scheduler."""
    warmup_iters = max(warmup_iters, 1)

    def sched(step):
        ramp = init_lr_ratio + (1 - init_lr_ratio) * (step / warmup_iters)
        return jnp.where(step < warmup_iters, base_lr * ramp, after(step - warmup_iters))

    return sched


def _vae_mask(params, exempt: bool):
    """weight-decay mask: vae/head params get wd=0 (optimizer.py:41-58)."""

    def check(path, _):
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        is_vae = bool(re.search(r"(hand_head|obj_head|cvae)", s))
        return is_vae if exempt else not is_vae

    return jax.tree_util.tree_map_with_path(check, params)


def make_hoi_optimizer(
    params,
    kind: str = "adam",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    lr_ = schedule if schedule is not None else lr
    if kind == "adam":
        # torch.optim.Adam couples weight decay as L2 added to the grad
        # BEFORE the moment updates (optimizer.py:47-48) — not AdamW's
        # decoupled decay; add_decayed_weights feeds adam's moments the
        # same grad+wd*p torch sees (tests/test_hoi_convergence_parity.py)
        make = lambda wd: optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(lr_),
        )
    elif kind == "adamw":
        make = lambda wd: optax.adamw(lr_, weight_decay=wd)
    elif kind == "sgd":
        make = lambda wd: optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(lr_, momentum=momentum),
        )
    elif kind == "rms":
        # torch.optim.RMSprop defaults alpha=0.99 (optax's decay is 0.9)
        make = lambda wd: optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.rmsprop(lr_, decay=0.99),
        )
    else:
        raise ValueError(kind)
    return optax.chain(
        optax.masked(make(0.0), _vae_mask(params, exempt=True)),
        optax.masked(make(weight_decay), _vae_mask(params, exempt=False)),
    )


def make_hoi_train_step(cfg: ObjectTransformerConfig, tx, lambdas: Dict[str, float]):
    @jax.jit
    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            return hoi_forecast_loss(p, cfg, batch, rng, **lambdas)

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), losses

    return step


def epoch_pass(loader: Iterable, state: TrainState, step_fn, rng) -> Tuple[TrainState, Dict[str, float]]:
    """One training epoch (trainer.py:11-92), returning mean losses."""
    sums: Dict[str, float] = {}
    n = 0
    for batch in loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, (np.ndarray, jnp.ndarray))}
        state, losses = step_fn(state, batch, rng)
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return state, {k: v / max(n, 1) for k, v in sums.items()}


def epoch_evaluate(
    loader: Iterable, params, cfg: ObjectTransformerConfig, rng,
    num_samples: int = 5, pred_len: int = 4,
) -> Dict[str, float]:
    """Stochastic eval (trainer.py:95-170): multi-sample rollout, ADE/FDE."""
    sample_fn = jax.jit(
        lambda p, b, r: hoi_forecast_sample(p, cfg, b, r, num_samples, pred_len),
        static_argnames=(),
    )
    preds, gts, valids = [], [], []
    for batch in loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, (np.ndarray, jnp.ndarray))}
        rng, r = jax.random.split(rng)
        hands, _ = sample_fn(params, batch, r)  # (B,S,2,T,2)
        preds.append(np.asarray(hands))
        gts.append(np.asarray(batch["future_hands"])[:, :, 1:, :])
        valids.append(np.asarray(batch["future_valid"]))
    ade, fde, wde = evaluate_traj_stochastic(
        np.concatenate(preds), np.concatenate(gts), np.concatenate(valids)
    )
    return {"ade": ade, "fde": fde, "wde": wde}
