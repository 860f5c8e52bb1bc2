"""LITA-style video token compression (slow-fast pooling).

Behavioral spec from `lita/model/lita_arch.py:30-77` /
`hoi_forecast/model/visual_to_tokens.py:230-272`: given per-frame CLIP+
projector tokens (B, T, S, D) with S=256 patches, compress to the video_arch
token layout. The shipped mode is `temporal_spatial_pool`: T temporal means
+ 4 evenly spaced keyframes avg-pooled 16x16 -> 8x8 => T + 256 tokens (356
for T=100).

All modes are static-shape jnp ops that fuse into the surrounding program;
frame selection indices are computed at trace time (numpy on static shapes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _selected_frames(t: int, n: int = 4) -> np.ndarray:
    # matches np.round(np.linspace(0, t-1, pool_size**2)) in the reference
    return np.round(np.linspace(0, t - 1, n)).astype(int)


def pool_video_tokens(tokens: jnp.ndarray, video_arch: str) -> jnp.ndarray:
    """tokens: (B, T, S, D) -> (B, N_vis, D) per video_arch."""
    b, t, s, d = tokens.shape
    if video_arch == "all" or video_arch == "none":
        return tokens.reshape(b, t * s, d)
    if video_arch == "temporal":
        return tokens.mean(axis=2)
    if video_arch == "spatial":
        return tokens.mean(axis=1)
    if video_arch == "temporal_spatial":
        t_tokens = tokens.mean(axis=2)
        s_tokens = tokens.mean(axis=1)
        return jnp.concatenate([t_tokens, s_tokens], axis=1)
    if video_arch in ("temporal_spatial_pool", "spatial_pool"):
        pool = 2
        grid = int(round(s ** 0.5))
        assert grid * grid == s, f"patch count {s} is not square"
        sel = _selected_frames(t, pool * pool)
        # (B, 4, S, D) -> (B, 4, g, g, D) -> 2x2 avg pool -> (B, 4*(g/2)^2, D)
        st = tokens[:, sel].reshape(b, pool * pool, grid, grid, d)
        st = st.reshape(b, pool * pool, grid // 2, 2, grid // 2, 2, d)
        st = st.mean(axis=(3, 5))
        s_tokens = st.reshape(b, pool * pool * (grid // 2) * (grid // 2), d)
        if video_arch == "spatial_pool":
            return s_tokens
        t_tokens = tokens.mean(axis=2)
        return jnp.concatenate([t_tokens, s_tokens], axis=1)
    raise ValueError(f"unknown video_arch {video_arch}")


def num_pooled_tokens(t: int, s: int, video_arch: str) -> int:
    return {
        "all": t * s,
        "none": t * s,
        "temporal": t,
        "spatial": s,
        "temporal_spatial": t + s,
        "temporal_spatial_pool": t + s,
        "spatial_pool": s,
    }[video_arch]
