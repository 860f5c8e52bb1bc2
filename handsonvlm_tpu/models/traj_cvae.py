"""CVAE / MLP hand-trajectory heads.

Behavioral spec from the reference:
- `VAE` (hoi_forecast/architecture/decoder_modules.py:5-61): conditional
  encoder -> (mu, log_var) -> reparameterised z -> decoder; per-sample
  sum-of-squares recon loss and analytic KL.
- `TrajCVAE` (hoi_forecast/architecture/traj_decoder.py:8-91): condition =
  hand-token hidden-state half (token_dim = llm_hidden/2), validity-masked
  losses, z ~ z_scale * N(0, I) at inference (z_scale=2.0).
- `TrajMLP` (traj_decoder.py:94-152): deterministic MSE alternative.
- Loss wrapper (handsonvlm/model/language_model/traj_decoder.py:12-37):
  traj_loss = lambda_traj * sum_B, kl = lambda_traj_kl * sum_B.

RNG is explicit (JAX): training reparameterisation and inference prior draws
take a PRNG key, making CVAE sampling reproducible (SURVEY.md §7 stage 1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import TrajDecoderConfig


def _linear(rng, din, dout, dtype):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(din)
    return {
        "kernel": jax.random.uniform(k1, (din, dout), minval=-bound, maxval=bound).astype(dtype),
        "bias": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound).astype(dtype),
    }


def init_traj_decoder(rng: jax.Array, cfg: TrajDecoderConfig, token_dim: int, dtype=jnp.float32):
    """token_dim is llm_hidden // 2 (one hand's half of the hidden state)."""
    keys = jax.random.split(rng, 8)
    if cfg.kind == "CVAE":
        in_dim = 2  # (x, y) waypoint
        enc_in = in_dim + token_dim
        dec_in = cfg.latent_dim + token_dim
        return {
            "enc": _linear(keys[0], enc_in, cfg.hidden_dim, dtype),
            "mean": _linear(keys[1], cfg.hidden_dim, cfg.latent_dim, dtype),
            "log_var": _linear(keys[2], cfg.hidden_dim, cfg.latent_dim, dtype),
            "dec1": _linear(keys[3], dec_in, cfg.hidden_dim, dtype),
            "dec2": _linear(keys[4], cfg.hidden_dim, in_dim, dtype),
        }
    if cfg.kind == "MLP":
        return {
            "mlp1": _linear(keys[0], token_dim, cfg.hidden_dim, dtype),
            "mlp2": _linear(keys[1], cfg.hidden_dim, cfg.hidden_dim, dtype),
            "mlp3": _linear(keys[2], cfg.hidden_dim, 2, dtype),
        }
    raise ValueError(cfg.kind)


def _apply(p, x):
    return x @ p["kernel"] + p["bias"]


def _cvae_encode(params, gt, cond):
    h = jax.nn.elu(_apply(params["enc"], jnp.concatenate([gt, cond], axis=-1)))
    return _apply(params["mean"], h), _apply(params["log_var"], h)


def _cvae_decode(params, z, cond):
    h = jax.nn.elu(_apply(params["dec1"], jnp.concatenate([z, cond], axis=-1)))
    return _apply(params["dec2"], h)


def cvae_forward(
    params, gt: jnp.ndarray, cond: jnp.ndarray, rng: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """VAE.forward: (N,2) gt + (N,token_dim) condition -> (recon, per-sample
    recon_loss, per-sample KLD)."""
    mean, log_var = _cvae_encode(params, gt, cond)
    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
    z = mean + eps * std
    recon = _cvae_decode(params, z, cond)
    recon_loss = jnp.sum((recon - gt) ** 2, axis=1)
    kld = -0.5 * jnp.sum(1 + log_var - mean**2 - jnp.exp(log_var), axis=1)
    return recon, recon_loss, kld


def cvae_inference(params, cfg: TrajDecoderConfig, cond: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """TrajCVAE.inference: z ~ z_scale * N(0, I); decode."""
    n = cond.shape[0]
    z = cfg.z_scale * jax.random.normal(rng, (n, cfg.latent_dim), dtype=cond.dtype)
    return _cvae_decode(params, z, cond)


def mlp_forward(params, cond: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(_apply(params["mlp1"], cond))
    h = jax.nn.relu(_apply(params["mlp2"], h))
    return _apply(params["mlp3"], h)


def traj_decoder_loss(
    params,
    cfg: TrajDecoderConfig,
    pred_hand_embeddings: jnp.ndarray,  # (B, 2, T_pred, token_dim)
    future_hands: jnp.ndarray,  # (B, 2, T_pred, 2)
    future_valid: jnp.ndarray,  # (B, 2) bool/float
    rng: jax.Array,
    lambda_traj: float,
    lambda_traj_kl: float,
) -> Dict[str, jnp.ndarray]:
    """TrajDecoder.forward + TrajCVAE.forward loss composition."""
    b, two, t_pred, token_dim = pred_hand_embeddings.shape
    cond = pred_hand_embeddings.reshape(-1, token_dim)
    gt = future_hands.reshape(-1, 2).astype(cond.dtype)
    valid = future_valid.astype(jnp.float32)

    if cfg.kind == "CVAE":
        _, recon, kld = cvae_forward(params, gt, cond, rng)
        recon = recon.reshape(b, 2, t_pred).astype(jnp.float32)
        # validity masking (traj_decoder.py:62-70). Reference quirk: the KL
        # is summed over the WHOLE flattened batch (`KLD.sum(-1)` on a 1-D
        # tensor, traj_decoder.py:66) and then scaled by each sample's valid
        # count — NOT masked per sample like the recon term. Preserved.
        traj_per_b = (recon.sum(-1) * valid).sum(1)
        kld_total = kld.astype(jnp.float32).sum()
        kl_per_b = kld_total * valid.sum(1)
        traj_loss = lambda_traj * traj_per_b.sum()
        kl_loss = lambda_traj_kl * kl_per_b.sum()
    else:
        pred = mlp_forward(params, cond)
        recon = jnp.sum((pred - gt) ** 2, axis=-1).reshape(b, 2, t_pred).astype(jnp.float32)
        # TrajMLP masks with a (B,2,T) valid grid; the wrapper passes (B,2) —
        # broadcast over time like the reference's effective behavior.
        mask = jnp.broadcast_to(valid[:, :, None], recon.shape)
        denom = mask.sum() + 1e-6
        mean_loss = (recon * mask).sum() / denom
        traj_loss = lambda_traj * mean_loss * b  # .repeat(B).sum() == B * mean
        kl_loss = jnp.zeros((), jnp.float32)

    return {
        "traj_loss": traj_loss,
        "traj_kl_loss": kl_loss,
        "total_loss": traj_loss + kl_loss,
    }


def traj_decoder_inference(
    params,
    cfg: TrajDecoderConfig,
    pred_hand_embeddings: jnp.ndarray,  # (B, 2, T_pred, token_dim)
    rng: jax.Array,
) -> jnp.ndarray:
    """TrajDecoder.inference -> (B, 2, T_pred, 2) waypoints."""
    b, two, t_pred, token_dim = pred_hand_embeddings.shape
    cond = pred_hand_embeddings.reshape(-1, token_dim)
    if cfg.kind == "CVAE":
        pred = cvae_inference(params, cfg, cond, rng)
    else:
        pred = mlp_forward(params, cond)
    return pred.reshape(b, 2, t_pred, 2)
