"""ObjectTransformer parity vs the reference torch architecture (oracle).

Loads the reference hoi_forecast architecture code, converts its randomly
initialized weights, and compares: the bbox/feature fusion, the space-time
encoder, the coordinate decoder, the full teacher-forced losses (eps=0) and
the autoregressive rollout (z=0). Dropout/DropPath are identity in eval
mode, making every path deterministic.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.convert.object_transformer import convert_object_transformer
from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    apply_decoder,
    apply_encoder,
    encoder_input,
    object_transformer_forward,
    object_transformer_inference,
)

torch = pytest.importorskip("torch")

CFG = ObjectTransformerConfig(
    token_dim=32, coord_dim=8, num_heads=4, enc_depth=2, dec_depth=2,
    hidden_dim=16, latent_dim=8,
)


def _fake_pkg(name, path):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_model():
    _fake_pkg("hoi_forecast", "/root/reference/hoi_forecast")
    _fake_pkg("hoi_forecast.architecture", "/root/reference/hoi_forecast/architecture")
    try:
        from hoi_forecast.architecture.affordance_decoder import AffordanceCVAE
        from hoi_forecast.architecture.object_transformer import ObjectTransformer
        from hoi_forecast.architecture.traj_decoder import TrajCVAE
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    hand_head = TrajCVAE(
        in_dim=2, hidden_dim=CFG.hidden_dim, latent_dim=CFG.latent_dim,
        token_dim=CFG.token_dim, coord_dim=CFG.coord_dim,
    )
    obj_head = AffordanceCVAE(
        in_dim=2, hidden_dim=CFG.hidden_dim, latent_dim=CFG.latent_dim,
        token_dim=CFG.token_dim, coord_dim=CFG.coord_dim,
    )
    model = ObjectTransformer(
        src_in_features=1024, trg_in_features=2, num_patches=5,
        hand_head=hand_head, obj_head=obj_head,
        token_dim=CFG.token_dim, coord_dim=CFG.coord_dim,
        num_heads=CFG.num_heads, enc_depth=CFG.enc_depth, dec_depth=CFG.dec_depth,
    ).eval()
    params = convert_object_transformer(model.state_dict(), CFG)
    return model, params


def _batch(b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "feat": rng.normal(size=(b, 5, t, 1024)).astype(np.float32),
        "bbox_feat": rng.uniform(size=(b, 4, t, 4)).astype(np.float32),
        "valid_mask": np.ones((b, 5, t), np.float32),
        "future_hands": rng.uniform(size=(b, 2, 5, 2)).astype(np.float32),
        "contact_point": rng.uniform(size=(b, 2)).astype(np.float32),
        "future_valid": np.ones((b, 2), np.float32),
    }


def test_encoder_input_parity(ref_model):
    model, params = ref_model
    d = _batch()
    src_mask = torch.tensor(d["valid_mask"]).transpose(1, 2)
    with torch.no_grad():
        ref_tokens, _ = model.encoder_input(
            torch.tensor(d["feat"]), torch.tensor(d["bbox_feat"]), src_mask
        )
    got, _ = encoder_input(
        params, CFG, jnp.asarray(d["feat"]), jnp.asarray(d["bbox_feat"]),
        jnp.asarray(d["valid_mask"]).transpose(0, 2, 1),
    )
    np.testing.assert_allclose(np.asarray(got), ref_tokens.numpy(), atol=2e-5)


def test_encoder_parity(ref_model):
    model, params = ref_model
    d = _batch(seed=1)
    src_mask_t = torch.tensor(d["valid_mask"]).transpose(1, 2)
    with torch.no_grad():
        tokens_t, _ = model.encoder_input(
            torch.tensor(d["feat"]), torch.tensor(d["bbox_feat"]), src_mask_t
        )
        ref = model.oct_encoder(tokens_t, valid_mask=src_mask_t).numpy()
    src_mask = jnp.asarray(d["valid_mask"]).transpose(0, 2, 1)
    tokens, _ = encoder_input(
        params, CFG, jnp.asarray(d["feat"]), jnp.asarray(d["bbox_feat"]), src_mask
    )
    got = np.asarray(apply_encoder(params["encoder"], CFG, tokens, src_mask))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_decoder_parity(ref_model):
    model, params = ref_model
    rng = np.random.default_rng(2)
    b, t_pred = 2, 5
    coords = rng.uniform(size=(b, t_pred - 1, 2)).astype(np.float32)
    memory = rng.normal(size=(b, 5, CFG.token_dim)).astype(np.float32)
    with torch.no_grad():
        from hoi_forecast.architecture.net_utils import get_pad_mask, get_subsequent_mask

        mem_mask = get_pad_mask(torch.ones(b, 5), pad_idx=0)
        trg_mask = get_subsequent_mask(torch.ones(b, t_pred - 1))
        ref = model.oct_decoder(
            torch.tensor(coords), torch.tensor(memory),
            last_hidden_state_mask=mem_mask, hand_embedding_mask=trg_mask,
        ).numpy()
    got = np.asarray(
        apply_decoder(
            params["decoder"], CFG, jnp.asarray(coords), jnp.asarray(memory),
            jnp.ones((b, 1, 5)),
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_forward_losses_parity_eps0(ref_model, monkeypatch):
    model, params = ref_model
    d = _batch(seed=3)
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    with torch.no_grad():
        ref = model(
            feat=torch.tensor(d["feat"]), bbox_feat=torch.tensor(d["bbox_feat"]),
            valid_mask=torch.tensor(d["valid_mask"]),
            future_hands=torch.tensor(d["future_hands"]),
            contact_point=torch.tensor(d["contact_point"]),
            future_valid=torch.tensor(d["future_valid"]),
        )
    ref_names = ["traj_loss", "traj_kl_loss", "obj_loss", "obj_kl_loss", "last_hand_loss"]
    ref_losses = dict(zip(ref_names, [r.numpy() for r in ref]))

    orig_normal = jax.random.normal
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    try:
        losses = object_transformer_forward(
            params, CFG, jnp.asarray(d["feat"]), jnp.asarray(d["bbox_feat"]),
            jnp.asarray(d["valid_mask"]), jnp.asarray(d["future_hands"]),
            jnp.asarray(d["contact_point"]), jnp.asarray(d["future_valid"]),
            jax.random.PRNGKey(0),
        )
    finally:
        monkeypatch.setattr(jax.random, "normal", orig_normal)
    for k in ref_names:
        np.testing.assert_allclose(
            np.asarray(losses[k]), ref_losses[k], atol=1e-3, rtol=1e-3, err_msg=k
        )


def test_inference_rollout_parity_z0(ref_model, monkeypatch):
    model, params = ref_model
    d = _batch(seed=4)
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.zeros(*s, **{kk: vv for kk, vv in k.items() if kk != "device"}))
    with torch.no_grad():
        ref_hands, ref_contact = model.inference(
            feat=torch.tensor(d["feat"]), bbox_feat=torch.tensor(d["bbox_feat"]),
            valid_mask=torch.tensor(d["valid_mask"]),
            future_valid=torch.tensor(d["future_valid"]),
        )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    hands, contact = object_transformer_inference(
        params, CFG, jnp.asarray(d["feat"]), jnp.asarray(d["bbox_feat"]),
        jnp.asarray(d["valid_mask"]), jnp.asarray(d["future_valid"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(hands), ref_hands.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(contact), ref_contact.numpy(), atol=1e-4, rtol=1e-3)
