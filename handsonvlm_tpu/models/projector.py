"""Multimodal projector: CLIP feature space -> decoder embedding space.

The reference uses a single linear layer `mm_projector = nn.Linear(1024,
hidden)` (llava/model/llava_arch.py:33,62), loaded from the LLaVA-pretrained
adapter. Kept as a standalone param group so adapter-only checkpoints
(`mm_projector.bin`, reference train.py:104-122) convert cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_projector(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    k1, _ = jax.random.split(rng)
    scale = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": (jax.random.uniform(k1, (in_dim, out_dim), minval=-1, maxval=1) * scale).astype(dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def apply_projector(params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["kernel"] + params["bias"]
