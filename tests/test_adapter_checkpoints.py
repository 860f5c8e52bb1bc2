"""Adapter-only checkpoint artifacts: mm_projector and LoRA save/load.

Reference behaviors covered: adapter-only `mm_projector.bin` saves
(handsonvlm/train/train.py:104-122) and the LoRA checkpoint pair
(adapters + `non_lora_trainables.bin`, train.py:407-413) with the
builder-side base+graft+merge load (handsonvlm/model/builder.py:37-87).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.checkpoint import (
    has_artifact,
    restore_artifact,
    save_artifact,
)
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.infer.builder import load_pretrained_model
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.models.lora import init_lora, merge_lora

pytest.importorskip("orbax.checkpoint")

CFG = tiny_config()


def _tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_artifact_roundtrip_and_overwrite(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3)}
    save_artifact(str(tmp_path), "mm_projector", tree, meta={"base": "x"})
    assert has_artifact(str(tmp_path), "mm_projector")
    _tree_equal(tree, restore_artifact(str(tmp_path), "mm_projector"))
    # adapter saves repeat every save_every steps — force-overwrite must work
    tree2 = {"w": jnp.ones((2, 3))}
    save_artifact(str(tmp_path), "mm_projector", tree2, meta={"base": "x"})
    _tree_equal(tree2, restore_artifact(str(tmp_path), "mm_projector"))


def test_mm_projector_adapter_load(tmp_path):
    trained = init_handsonvlm(jax.random.PRNGKey(1), CFG)
    save_artifact(
        str(tmp_path), "mm_projector", trained["projector"],
        meta={"base": "random:tiny", "preset": "tiny"},
    )
    params, cfg, _ = load_pretrained_model(str(tmp_path), "tiny")
    # projector comes from the artifact, the rest from the base init
    _tree_equal(params["projector"], trained["projector"])
    # builder inits under jit (7B heap hygiene) — match its rounding
    base = jax.jit(lambda k: init_handsonvlm(k, CFG))(jax.random.PRNGKey(0))
    _tree_equal(params["llama"]["embed"], base["llama"]["embed"])


def test_lora_adapter_load_merges(tmp_path):
    base = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(3), CFG.llama, r=4, alpha=8.0)
    # make B nonzero so the merge actually changes the weights
    lora["adapters"]["wq"]["b"] = (
        jax.random.normal(jax.random.PRNGKey(4), lora["adapters"]["wq"]["b"].shape) * 0.1
    )
    trained = init_handsonvlm(jax.random.PRNGKey(5), CFG)
    save_artifact(str(tmp_path), "lora", lora,
                  meta={"base": "random:tiny", "preset": "tiny", "r": 4, "alpha": 8.0})
    save_artifact(str(tmp_path), "non_lora_trainables",
                  {"projector": trained["projector"], "traj": trained["traj"]})

    params, cfg, _ = load_pretrained_model(str(tmp_path), "tiny")
    _tree_equal(params["projector"], trained["projector"])
    _tree_equal(params["traj"], trained["traj"])
    expect = merge_lora(base["llama"], lora)
    np.testing.assert_allclose(
        np.asarray(params["llama"]["layers"]["attn"]["wq"], np.float32),
        np.asarray(expect["layers"]["attn"]["wq"], np.float32),
        rtol=2e-2, atol=2e-2,  # artifact restores fp32; base params are bf16
    )
    assert "lora" not in params  # merged, not kept as a separate tree
