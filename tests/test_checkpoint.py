"""Orbax checkpoint save/restore round-trip, including sharded state."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.checkpoint import (
    restore_params,
    restore_train_state,
    save_params,
    save_train_state,
)
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.parallel.mesh import create_mesh
from handsonvlm_tpu.parallel.partition import shard_params
from handsonvlm_tpu.train.train_state import create_train_state, make_optimizer

pytest.importorskip("orbax.checkpoint")

CFG = tiny_config()


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_roundtrip(tmp_path):
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    save_params(str(tmp_path / "ck"), params)
    restored = restore_params(str(tmp_path / "ck"))
    _tree_equal(params, restored)


def test_train_state_roundtrip_sharded(tmp_path):
    mesh = create_mesh(data=8, model=1)
    params = shard_params(init_handsonvlm(jax.random.PRNGKey(0), CFG), mesh)
    tx = make_optimizer(learning_rate=1e-3, params_template=params)
    state = create_train_state(params, tx)
    state = type(state)(step=jnp.asarray(7, jnp.int32), params=state.params, opt_state=state.opt_state)

    save_train_state(str(tmp_path / "run"), state, step=7)
    template = create_train_state(params, tx)
    restored = restore_train_state(str(tmp_path / "run"), template)
    assert restored is not None
    assert int(restored.step) == 7
    _tree_equal(state.params, restored.params)
    # restored params keep the template's shardings
    wq = restored.params["llama"]["layers"]["attn"]["wq"]
    assert wq.sharding.spec == params["llama"]["layers"]["attn"]["wq"].sharding.spec


def test_restore_missing_returns_none(tmp_path):
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    tx = make_optimizer(params_template=params)
    template = create_train_state(params, tx)
    assert restore_train_state(str(tmp_path / "nope"), template) is None
