"""Training-numerics convergence parity vs the reference hoi_forecast recipe.

ROADMAP "bf16 training numerics: small-scale convergence comparison vs the
reference recipe" — the part that is runnable in this environment (fp32 CPU,
which isolates trainer semantics from dtype). Both sides start from the SAME
weights (reference torch init, converted), see the SAME batch sequence, and
run the reference default recipe: Adam with coupled-L2 weight decay 1e-4,
vae/head params exempt (hoi_forecast/model/optimizer.py:37-48, the default
`--optimizer adam --weight_decay 1e-4`, options/netsopts.py:45,56). CVAE
noise is forced to zero on both sides and the torch model stays in eval()
(Dropout/DropPath identity — our model has none), so every difference left
is optimizer + gradient numerics. Per-step total losses must track within
fp32 drift tolerances across 8 steps.
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from handsonvlm_tpu.convert.object_transformer import convert_object_transformer
from handsonvlm_tpu.models.object_transformer import (
    ObjectTransformerConfig,
    hoi_forecast_loss,
)
from handsonvlm_tpu.train.hoi_trainer import make_hoi_optimizer

torch = pytest.importorskip("torch")

CFG = ObjectTransformerConfig(
    token_dim=32, coord_dim=8, num_heads=4, enc_depth=2, dec_depth=2,
    hidden_dim=16, latent_dim=8,
)
LAMBDAS = dict(lambda_traj=1.0, lambda_traj_kl=1e-3, lambda_obj=0.1,
               lambda_obj_kl=1e-3, lambda_last_hand=1e-3)
N_STEPS = 8
LR = 1e-3
WD = 1e-4


def _fake_pkg(name, path):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_model():
    _fake_pkg("hoi_forecast", "/root/reference/hoi_forecast")
    _fake_pkg("hoi_forecast.architecture",
              "/root/reference/hoi_forecast/architecture")
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
        num_heads=CFG.num_heads, enc_depth=CFG.enc_depth,
        dec_depth=CFG.dec_depth,
    ).eval()
    return model


def _batch(seed, b=2, t=10):
    rng = np.random.default_rng(seed)
    return {
        "feat": rng.normal(size=(b, 5, t, 1024)).astype(np.float32),
        "bbox_feat": rng.uniform(size=(b, 4, t, 4)).astype(np.float32),
        "valid_mask": np.ones((b, 5, t), np.float32),
        "future_hands": rng.uniform(size=(b, 2, 5, 2)).astype(np.float32),
        "contact_point": rng.uniform(size=(b, 2)).astype(np.float32),
        "future_valid": np.ones((b, 2), np.float32),
    }


def _torch_total(model, d):
    traj, traj_kl, obj, obj_kl, last_hand = model(
        feat=torch.tensor(d["feat"]), bbox_feat=torch.tensor(d["bbox_feat"]),
        valid_mask=torch.tensor(d["valid_mask"]),
        future_hands=torch.tensor(d["future_hands"]),
        contact_point=torch.tensor(d["contact_point"]),
        future_valid=torch.tensor(d["future_valid"]),
    )
    # HoiForecastModel.forward composition (build_model.py:18-71), matching
    # hoi_forecast_loss's lambda weighting
    return (LAMBDAS["lambda_traj"] * traj.sum()
            + LAMBDAS["lambda_traj_kl"] * traj_kl.sum()
            + LAMBDAS["lambda_obj"] * obj.sum()
            + LAMBDAS["lambda_obj_kl"] * obj_kl.sum()
            + LAMBDAS["lambda_last_hand"] * last_hand.sum())


def _torch_train(model, kind):
    """Reference recipe: param groups split by name, vae/head wd=0
    (optimizer.py:41-48)."""
    vae = [p for n, p in model.named_parameters()
           if ("vae" in n or "head" in n) and p.requires_grad]
    other = [p for n, p in model.named_parameters()
             if "vae" not in n and "head" not in n and p.requires_grad]
    groups = [{"params": vae, "weight_decay": 0.0}, {"params": other}]
    if kind == "adam":
        opt = torch.optim.Adam(groups, lr=LR, weight_decay=WD)
    else:
        opt = torch.optim.SGD(groups, lr=LR, momentum=0.9, weight_decay=WD)
    losses = []
    d = _batch(100)  # fixed batch: overfit so the loss trajectory DESCENDS
    for s in range(N_STEPS):
        opt.zero_grad()
        loss = _torch_total(model, d)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _jax_train(params, kind):
    tx = make_hoi_optimizer(params, kind=kind, lr=LR, weight_decay=WD,
                            momentum=0.9)
    opt_state = tx.init(params)
    losses = []
    d = {k: jnp.asarray(v) for k, v in _batch(100).items()}
    for s in range(N_STEPS):

        def loss_fn(p):
            return hoi_forecast_loss(p, CFG, d, jax.random.PRNGKey(0),
                                     **LAMBDAS)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("kind", ["adam", "sgd"])
def test_convergence_tracks_reference(ref_model, monkeypatch, kind):
    import copy

    model = copy.deepcopy(ref_model)
    # converted leaves can be zero-copy VIEWS of the torch parameter
    # buffers (tensor.numpy() shares memory) — snapshot them, or the torch
    # training below silently mutates the "initial" jax params too
    params = jax.tree_util.tree_map(
        np.array, convert_object_transformer(model.state_dict(), CFG))

    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))

    ref_losses = _torch_train(model, kind)
    got_losses = _jax_train(params, kind)

    # losses must move (this is a convergence test, not a no-op check) ...
    assert ref_losses[-1] < ref_losses[0]
    # ... and track step by step: fp32 drift compounds through the
    # optimizer state, so allow a tolerance that grows with step index
    for s, (r, g) in enumerate(zip(ref_losses, got_losses)):
        tol = 2e-3 * (1 + s)
        assert abs(r - g) / max(abs(r), 1e-6) < tol, (
            f"step {s}: ref {r:.6f} vs jax {g:.6f} (kind={kind})")
