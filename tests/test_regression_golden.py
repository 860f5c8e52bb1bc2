"""Golden regression values for the tiny model.

Pins deterministic quantities of the full pipeline so refactors across
rounds can't silently change numerics. If an INTENTIONAL numerics change
lands (e.g. a different init), regenerate with:
  python -m pytest tests/test_regression_golden.py --regen  (see conftest)
or update the literals below and say why in the commit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import forward, init_handsonvlm

CFG = tiny_config()


def _batch():
    rng = np.random.default_rng(1234)
    b, t = 2, 16
    ids = rng.integers(3, 1000, size=(b, t))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    ids[:, [8, 10, 12, 14]] = HAND_TOKEN_ID
    labels = np.full((b, t), IGNORE_INDEX)
    labels[:, 7:] = ids[:, 7:]
    return dict(
        input_ids=jnp.asarray(ids),
        attn_mask=jnp.ones((b, t), bool),
        images=jnp.asarray(
            rng.normal(size=(b, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)),
            jnp.float32,
        ),
        labels=jnp.asarray(labels),
        future_hands=jnp.asarray(rng.uniform(size=(b, 2, 5, 2)), jnp.float32),
        future_valid=jnp.ones((b, 2), jnp.float32),
        rng=jax.random.PRNGKey(7),
    )


def test_tiny_forward_golden():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    out = forward(params, CFG, **_batch(), attn_impl="xla")
    got = {
        "loss": float(out["loss"]),
        "text_loss": float(out["text_loss"]),
        "traj_loss": float(out["traj_loss"]),
        "traj_kl_loss": float(out["traj_kl_loss"]),
        "logits_mean": float(jnp.mean(out["logits"])),
    }
    # regenerated after replicating the reference's batch-global KL quirk
    # (traj_decoder.py:66) — see commit message
    golden = {
        "loss": 27.1411933899,
        "text_loss": 10.3793773651,
        "traj_loss": 16.6971263885,
        "traj_kl_loss": 0.0646902546,
        "logits_mean": -0.0001010363,
    }
    regen = {k: round(v, 10) for k, v in got.items()}
    for k, want in golden.items():
        assert abs(got[k] - want) < max(abs(want) * 1e-4, 1e-6), (
            f"{k}: got {got[k]!r}, golden {want!r}; full regen dict: {regen}"
        )
