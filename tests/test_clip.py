"""Parity of the JAX CLIP vision tower vs HF transformers CLIPVisionModel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import ClipVisionConfig
from handsonvlm_tpu.models.clip_vit import apply_clip_vision, init_clip_vision
from handsonvlm_tpu.convert.hf_to_jax import convert_clip_vision

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = ClipVisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=4,
    image_size=28,
    patch_size=14,
)


@pytest.fixture(scope="module")
def hf_and_jax():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        image_size=CFG.image_size,
        patch_size=CFG.patch_size,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    params = convert_clip_vision(hf.state_dict(), CFG, prefix="vision_model.")
    return hf, params


def test_penultimate_patch_features(hf_and_jax):
    hf, params = hf_and_jax
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(pix), output_hidden_states=True)
    # reference: hidden_states[select_layer][:, 1:] (clip_encoder.py)
    ref = out.hidden_states[CFG.select_layer][:, 1:].numpy()
    got = np.asarray(apply_clip_vision(params, CFG, jnp.asarray(pix), attn_impl="xla"))
    assert got.shape == ref.shape == (2, 4, 32)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-3)


def test_frozen_no_grad(hf_and_jax):
    _, params = hf_and_jax
    pix = jnp.ones((1, 3, 28, 28))

    def loss_fn(p):
        return apply_clip_vision(p, CFG, pix, attn_impl="xla").sum()

    grads = jax.grad(loss_fn)(params)
    total = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert total == 0.0


def test_init_runs():
    params = init_clip_vision(jax.random.PRNGKey(0), CFG)
    out = apply_clip_vision(params, CFG, jnp.zeros((1, 3, 28, 28)), attn_impl="xla")
    assert out.shape == (1, 4, 32)
