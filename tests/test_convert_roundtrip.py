"""HF <-> JAX weight conversion round-trips bit-exactly."""

import numpy as np
import jax

from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.convert.hf_to_jax import convert_handsonvlm
from handsonvlm_tpu.convert.jax_to_hf import export_handsonvlm
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

CFG = tiny_config()


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + str(k))
        elif isinstance(a[k], list):
            for i, (x, y) in enumerate(zip(a[k], b[k])):
                _tree_equal(x, y, f"{path}/{k}[{i}]")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + str(k)
            )


def test_roundtrip():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    sd = export_handsonvlm(params)
    # every exported tensor is plain numpy with HF names
    assert "model.embed_tokens.weight" in sd
    assert "model.vision_tower.vision_tower.vision_model.embeddings.class_embedding" in sd
    assert "hand_traj_decoder.hand_traj_decoder.cvae.enc_MLP.0.weight" in sd
    back = convert_handsonvlm(sd, CFG)
    _tree_equal(params, back)


def test_safetensors_roundtrip(tmp_path):
    import pytest

    pytest.importorskip("safetensors")
    from handsonvlm_tpu.convert.hf_to_jax import load_state_dict
    from handsonvlm_tpu.convert.jax_to_hf import save_hf_checkpoint

    params = init_handsonvlm(jax.random.PRNGKey(1), CFG)
    save_hf_checkpoint(params, str(tmp_path))
    sd = load_state_dict(str(tmp_path))
    back = convert_handsonvlm(sd, CFG)
    _tree_equal(params, back)
