"""CVAE trajectory head: parity vs a torch build of the reference spec.

The torch modules here re-create the reference architecture
(hoi_forecast/architecture/decoder_modules.py VAE, traj_decoder.py TrajCVAE)
as a test fixture so the converter naming and the JAX math can be verified
end-to-end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import TrajDecoderConfig
from handsonvlm_tpu.convert.hf_to_jax import convert_traj_cvae
from handsonvlm_tpu.models.traj_cvae import (
    _cvae_decode,
    cvae_forward,
    init_traj_decoder,
    traj_decoder_inference,
    traj_decoder_loss,
)

torch = pytest.importorskip("torch")
nn = torch.nn

CFG = TrajDecoderConfig(hidden_dim=16, latent_dim=8, coord_dim=4)
TOKEN_DIM = 12


class TorchVAE(nn.Module):
    """Reference VAE spec (decoder_modules.py:5-61)."""

    def __init__(self, in_dim, hidden_dim, latent_dim, condition_dim):
        super().__init__()
        self.enc_MLP = nn.Sequential(nn.Linear(in_dim + condition_dim, hidden_dim), nn.ELU())
        self.linear_means = nn.Linear(hidden_dim, latent_dim)
        self.linear_log_var = nn.Linear(hidden_dim, latent_dim)
        self.dec_MLP = nn.Sequential(
            nn.Linear(latent_dim + condition_dim, hidden_dim),
            nn.ELU(),
            nn.Linear(hidden_dim, in_dim),
        )


@pytest.fixture(scope="module")
def torch_and_jax():
    torch.manual_seed(0)
    tv = TorchVAE(2, CFG.hidden_dim, CFG.latent_dim, TOKEN_DIM)
    sd = {f"hand_traj_decoder.hand_traj_decoder.cvae.{k}": v for k, v in tv.state_dict().items()}
    params = convert_traj_cvae(sd, CFG)
    return tv, params


def test_decoder_parity_fixed_z(torch_and_jax):
    tv, params = torch_and_jax
    rng = np.random.default_rng(0)
    z = rng.normal(size=(5, CFG.latent_dim)).astype(np.float32)
    c = rng.normal(size=(5, TOKEN_DIM)).astype(np.float32)
    with torch.no_grad():
        ref = tv.dec_MLP(torch.tensor(np.concatenate([z, c], -1))).numpy()
    got = np.asarray(_cvae_decode(params, jnp.asarray(z), jnp.asarray(c)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_encoder_and_losses_parity(torch_and_jax):
    """With eps=0 (deterministic z=mu) recon and KL match the torch spec."""
    tv, params = torch_and_jax
    rng = np.random.default_rng(1)
    gt = rng.uniform(size=(6, 2)).astype(np.float32)
    c = rng.normal(size=(6, TOKEN_DIM)).astype(np.float32)

    with torch.no_grad():
        h = tv.enc_MLP(torch.tensor(np.concatenate([gt, c], -1)))
        mean = tv.linear_means(h)
        log_var = tv.linear_log_var(h)
        z = mean  # eps = 0
        recon = tv.dec_MLP(torch.cat([z, torch.tensor(c)], -1))
        recon_loss = ((recon - torch.tensor(gt)) ** 2).sum(1).numpy()
        kld = (-0.5 * (1 + log_var - mean.pow(2) - log_var.exp()).sum(1)).numpy()

    # zero-eps rng: fold a key and zero out by monkey-patching normal
    class ZeroKey:
        pass

    orig = jax.random.normal
    try:
        jax.random.normal = lambda *a, **k: jnp.zeros(a[1] if len(a) > 1 else k["shape"], dtype=k.get("dtype", jnp.float32))
        _, rl, kl = cvae_forward(params, jnp.asarray(gt), jnp.asarray(c), jax.random.PRNGKey(0))
    finally:
        jax.random.normal = orig
    np.testing.assert_allclose(np.asarray(rl), recon_loss, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kl), kld, atol=1e-5)


def test_loss_wrapper_masking():
    params = init_traj_decoder(jax.random.PRNGKey(0), CFG, TOKEN_DIM)
    b = 3
    emb = jnp.asarray(np.random.default_rng(2).normal(size=(b, 2, 4, TOKEN_DIM)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(3).uniform(size=(b, 2, 4, 2)), jnp.float32)
    valid_all = jnp.ones((b, 2))
    valid_none = jnp.zeros((b, 2))
    rng = jax.random.PRNGKey(1)
    l_all = traj_decoder_loss(params, CFG, emb, gt, valid_all, rng, 1.0, 1e-3)
    l_none = traj_decoder_loss(params, CFG, emb, gt, valid_none, rng, 1.0, 1e-3)
    assert float(l_none["total_loss"]) == 0.0
    assert float(l_all["traj_loss"]) > 0.0
    assert float(l_all["total_loss"]) == pytest.approx(
        float(l_all["traj_loss"]) + float(l_all["traj_kl_loss"])
    )


def test_inference_shape_and_stochasticity():
    params = init_traj_decoder(jax.random.PRNGKey(0), CFG, TOKEN_DIM)
    emb = jnp.ones((2, 2, 4, TOKEN_DIM))
    p1 = traj_decoder_inference(params, CFG, emb, jax.random.PRNGKey(1))
    p2 = traj_decoder_inference(params, CFG, emb, jax.random.PRNGKey(2))
    p1b = traj_decoder_inference(params, CFG, emb, jax.random.PRNGKey(1))
    assert p1.shape == (2, 2, 4, 2)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))  # stochastic
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1b))  # reproducible


def test_mlp_decoder():
    cfg = TrajDecoderConfig(kind="MLP", hidden_dim=16, latent_dim=8)
    params = init_traj_decoder(jax.random.PRNGKey(0), cfg, TOKEN_DIM)
    emb = jnp.ones((2, 2, 4, TOKEN_DIM))
    out = traj_decoder_inference(params, cfg, emb, jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 4, 2)
    losses = traj_decoder_loss(
        params, cfg, emb, jnp.zeros((2, 2, 4, 2)), jnp.ones((2, 2)),
        jax.random.PRNGKey(0), 1.0, 1e-3,
    )
    assert float(losses["traj_kl_loss"]) == 0.0
