"""Train step: loss decreases, vision stays frozen, FSDP sharding works on
the simulated 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.parallel.mesh import create_mesh
from handsonvlm_tpu.parallel.partition import named_shardings, shard_params
from handsonvlm_tpu.train.step import make_train_step
from handsonvlm_tpu.train.train_state import (
    cosine_schedule,
    create_train_state,
    make_optimizer,
)

CFG = tiny_config()


def _batch(b=2, t=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(b, t))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    ids[:, [8, 10, 12, 14]] = HAND_TOKEN_ID
    labels = np.full((b, t), IGNORE_INDEX)
    labels[:, 7:] = ids[:, 7:]
    return {
        "input_ids": jnp.asarray(ids),
        "attn_mask": jnp.ones((b, t), bool),
        "image": jnp.asarray(
            rng.normal(size=(b, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)),
            jnp.float32,
        ),
        "labels": jnp.asarray(labels),
        "future_hands": jnp.asarray(rng.uniform(size=(b, 2, 5, 2)), jnp.float32),
        "future_valid": jnp.ones((b, 2), jnp.float32),
    }


def test_loss_decreases_and_vision_frozen():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    vision_before = jax.tree_util.tree_map(lambda x: np.asarray(x), params["vision"])
    tx = make_optimizer(learning_rate=1e-3, params_template=params)
    state = create_train_state(params, tx)
    step = make_train_step(CFG, tx, attn_impl="xla")
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
    # vision params untouched (frozen via optax mask)
    for a, b in zip(
        jax.tree_util.tree_leaves(vision_before),
        jax.tree_util.tree_leaves(state.params["vision"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_fsdp_sharded_step_on_8_device_mesh():
    mesh = create_mesh(data=8, model=1)
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    params = shard_params(params, mesh)
    tx = make_optimizer(learning_rate=1e-3, params_template=params)
    state = create_train_state(params, tx)
    step = make_train_step(CFG, tx, attn_impl="xla")

    batch = _batch(b=8)
    bs = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, bs) for k, v in batch.items()}

    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params keep their shardings through the step (wq: (L, D, H) FSDP on D)
    wq_spec = state.params["llama"]["layers"]["attn"]["wq"].sharding.spec
    assert wq_spec[1] == "data", wq_spec


def test_tp_mesh_step():
    mesh = create_mesh(data=4, model=2)
    params = shard_params(init_handsonvlm(jax.random.PRNGKey(0), CFG), mesh)
    tx = make_optimizer(learning_rate=1e-3, params_template=params)
    state = create_train_state(params, tx)
    step = make_train_step(CFG, tx, attn_impl="xla")
    batch = _batch(b=4)
    bs = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_cosine_schedule():
    sched = cosine_schedule(2e-5, total_steps=1000, warmup_ratio=0.03)
    assert float(sched(0)) == 0.0
    assert float(sched(30)) == np.float32(2e-5)
    assert float(sched(1000)) < 1e-7
    assert 0 < float(sched(500)) < 2e-5


def test_qlora_int4_step():
    """QLoRA: frozen int4 decoder base + trainable LoRA adapters. Gradients
    flow through the quantized projections (custom VJP in ops/int8_matmul);
    loss decreases, the quantized base and its scales stay bit-identical,
    and the adapters move."""
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.models.lora import init_lora

    params, cfg, _ = load_pretrained_model("random:tiny", "tiny", quantize="int4")
    params["lora"] = init_lora(jax.random.PRNGKey(3), cfg.llama, r=2, alpha=4.0)
    int4_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x), params["llama"]["layers"]["int4"]
    )
    lora_b_before = np.asarray(params["lora"]["adapters"]["wq"]["b"])

    tx = make_optimizer(
        learning_rate=5e-3, params_template=params,
        freeze_top_keys=("vision", "llama"),
    )
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, attn_impl="xla")
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    for a, b in zip(
        jax.tree_util.tree_leaves(int4_before),
        jax.tree_util.tree_leaves(state.params["llama"]["layers"]["int4"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert np.abs(np.asarray(state.params["lora"]["adapters"]["wq"]["b"])
                  - lora_b_before).max() > 0


def test_remat_policies_match():
    """--remat-policy choices are numerically identical to no-remat (remat
    only changes WHAT is saved for backward, never the math)."""
    import optax

    from handsonvlm_tpu.train.train_state import TrainState

    tx = optax.sgd(1e-3)
    batch = _batch(seed=5)

    results = {}
    for remat in (False, "full", "dots", "dots_nobatch"):
        params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
        state = TrainState(step=jnp.asarray(0), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(CFG, tx, attn_impl="xla", remat=remat)
        _, m = step(state, batch, jax.random.PRNGKey(1))
        results[remat] = (float(m["loss"]), float(m["grad_norm"]))
    base = results[False]
    for k, v in results.items():
        np.testing.assert_allclose(v[0], base[0], rtol=1e-5, err_msg=str(k))
        np.testing.assert_allclose(v[1], base[1], rtol=1e-4, err_msg=str(k))


def test_remat_bad_policy_raises():
    import pytest as _pytest

    from handsonvlm_tpu.models.llama import _remat

    with _pytest.raises(ValueError):
        _remat(lambda x: x, "nope")


def test_qlora_int8_fused_step():
    """QLoRA with the fused int8 base (ops/qlora_fused): the stacked
    layers['int8'] tree rides the scan as constants and each targeted
    projection fuses its LoRA delta into the pallas epilogue. Loss
    decreases, the quantized base stays bit-identical, adapters move."""
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.models.lora import init_lora

    params, cfg, _ = load_pretrained_model(
        "random:tiny", "tiny", quantize="int8_fused")
    assert "int8" in params["llama"]["layers"]
    params["lora"] = init_lora(jax.random.PRNGKey(3), cfg.llama, r=2, alpha=4.0)
    int8_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x), params["llama"]["layers"]["int8"]
    )
    lora_b_before = np.asarray(params["lora"]["adapters"]["wq"]["b"])

    tx = make_optimizer(
        learning_rate=5e-3, params_template=params,
        freeze_top_keys=("vision", "llama"),
    )
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, attn_impl="xla")
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    for a, b in zip(
        jax.tree_util.tree_leaves(int8_before),
        jax.tree_util.tree_leaves(state.params["llama"]["layers"]["int8"]),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert np.abs(np.asarray(state.params["lora"]["adapters"]["wq"]["b"])
                  - lora_b_before).max() > 0
