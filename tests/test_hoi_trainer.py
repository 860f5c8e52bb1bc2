"""Standalone hoi-forecast trainer loop."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    init_object_transformer,
)
from handsonvlm_tpu.train.hoi_trainer import (
    epoch_evaluate,
    epoch_pass,
    make_hoi_optimizer,
    make_hoi_train_step,
    warmup_schedule,
)
from handsonvlm_tpu.train.train_state import create_train_state

CFG = ObjectTransformerConfig(
    token_dim=32, coord_dim=8, num_heads=4, enc_depth=1, dec_depth=1,
    hidden_dim=16, latent_dim=8,
)

LAMBDAS = dict(lambda_obj=0.1, lambda_traj=1.0, lambda_obj_kl=1e-3,
               lambda_traj_kl=1e-3, lambda_last_hand=1e-3)


def _batches(n=3, b=2, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {
            "feat": rng.normal(size=(b, 5, 10, 1024)).astype(np.float32),
            "bbox_feat": rng.uniform(size=(b, 4, 10, 4)).astype(np.float32),
            "valid_mask": np.ones((b, 5, 10), np.float32),
            "future_hands": rng.uniform(size=(b, 2, 5, 2)).astype(np.float32),
            "contact_point": rng.uniform(size=(b, 2)).astype(np.float32),
            "future_valid": np.ones((b, 2), np.float32),
        }


def test_warmup_schedule():
    after = optax.cosine_decay_schedule(1e-3, 100)
    sched = warmup_schedule(1e-3, warmup_iters=10, after=after)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) < 1e-3
    assert float(sched(10)) == np.float32(1e-3)


def test_train_decreases_loss():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    tx = make_hoi_optimizer(params, kind="adam", lr=1e-3)
    state = create_train_state(params, tx)
    step = make_hoi_train_step(CFG, tx, LAMBDAS)
    batch = next(iter(_batches(1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(6):
        state, ls = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(ls["total_loss"]))
    assert losses[-1] < losses[0]


def test_epoch_pass_and_evaluate():
    params = init_object_transformer(jax.random.PRNGKey(0), CFG)
    tx = make_hoi_optimizer(params, kind="adamw", lr=1e-4, weight_decay=0.01)
    state = create_train_state(params, tx)
    step = make_hoi_train_step(CFG, tx, LAMBDAS)
    state, means = epoch_pass(_batches(2), state, step, jax.random.PRNGKey(2))
    assert "total_loss" in means and np.isfinite(means["total_loss"])
    metrics = epoch_evaluate(_batches(2), state.params, CFG, jax.random.PRNGKey(3), num_samples=2)
    assert set(metrics) == {"ade", "fde", "wde"}
    assert all(np.isfinite(v) for v in metrics.values())
