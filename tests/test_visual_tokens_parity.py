"""hoi fuse modes parity vs the reference VisualToTokenHelper (oracle)."""

import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from handsonvlm_tpu.models.visual_tokens import fuse_hoi_features

torch = pytest.importorskip("torch")
nn = torch.nn

TOKEN_DIM = 64
MM_HIDDEN = 1024


def _fake_pkg(name, path):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def fixtures():
    _fake_pkg("hoi_forecast", "/root/reference/hoi_forecast")
    _fake_pkg("hoi_forecast.model", "/root/reference/hoi_forecast/model")
    try:
        from hoi_forecast.model.visual_to_tokens import VisualToTokenHelper
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    coord_dim = 64
    bbox_to_feature = nn.Sequential(
        nn.Linear(4, coord_dim // 2), nn.ELU(inplace=True),
        nn.Linear(coord_dim // 2, coord_dim), nn.ELU(),
    ).eval()
    feat_fusion = nn.Sequential(
        nn.Linear(MM_HIDDEN + coord_dim, MM_HIDDEN), nn.ELU(inplace=True)
    ).eval()
    downproject = nn.Linear(MM_HIDDEN, MM_HIDDEN).eval()
    projector = nn.Linear(MM_HIDDEN, TOKEN_DIM).eval()

    hoi_params = {
        "bbox_to_feature": {
            "fc1": {"kernel": jnp.asarray(bbox_to_feature[0].weight.detach().numpy().T),
                    "bias": jnp.asarray(bbox_to_feature[0].bias.detach().numpy())},
            "fc2": {"kernel": jnp.asarray(bbox_to_feature[2].weight.detach().numpy().T),
                    "bias": jnp.asarray(bbox_to_feature[2].bias.detach().numpy())},
        },
        "feat_fusion": {"kernel": jnp.asarray(feat_fusion[0].weight.detach().numpy().T),
                        "bias": jnp.asarray(feat_fusion[0].bias.detach().numpy())},
        "downproject": {"kernel": jnp.asarray(downproject.weight.detach().numpy().T),
                        "bias": jnp.asarray(downproject.bias.detach().numpy())},
    }
    proj_params = {"kernel": jnp.asarray(projector.weight.detach().numpy().T),
                   "bias": jnp.asarray(projector.bias.detach().numpy())}
    extra = {"downproject": downproject, "bbox_to_feature": bbox_to_feature,
             "feat_fusion": feat_fusion}
    return VisualToTokenHelper, projector, extra, hoi_params, proj_params


@pytest.mark.parametrize("mode", ["hoi", "hoi-hand", "hoi-global"])
def test_fuse_mode_parity(fixtures, mode):
    VisualToTokenHelper, projector, extra, hoi_params, proj_params = fixtures
    rng = np.random.default_rng(0)
    b, t = 2, 10
    feat = rng.normal(size=(b, 5, t, MM_HIDDEN)).astype(np.float32)
    bbox = rng.uniform(size=(b, 4, t, 4)).astype(np.float32)
    valid = (rng.uniform(size=(b, 5, t)) > 0.2).astype(np.float32)

    helper = VisualToTokenHelper(
        images_raw_encode=None, images_mm_projector=projector,
        fuse_input_mode=mode, video_compress_mode="none",
        mm_hidden_size=MM_HIDDEN, token_dim=TOKEN_DIM,
    )
    helper.b, helper.t = b, t
    with torch.no_grad():
        ref_tokens, ref_attn = helper.fuse_input(
            images=None, feat=torch.tensor(feat), bbox_feat=torch.tensor(bbox),
            valid_mask=torch.tensor(valid), extra_kwargs=extra,
        )
    got_tokens, got_attn = fuse_hoi_features(
        hoi_params, proj_params, mode,
        jnp.asarray(feat), jnp.asarray(bbox), jnp.asarray(valid),
    )
    np.testing.assert_allclose(
        np.asarray(got_tokens), ref_tokens.numpy(), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got_attn), ref_attn.numpy())
