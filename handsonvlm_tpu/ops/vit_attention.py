"""VMEM-resident full attention for short-sequence ViT shapes (CLIP).

The CLIP tower attends over T=257 patch tokens with d_head=64, non-causal,
unmasked (llava/model/multimodal_encoder/clip_encoder.py:7-80 runs the HF
CLIPVisionModel; the reference leaves these shapes to cuBLAS attention).
Blockwise flash attention is the wrong tool here — at (B=100, T=257, d=64)
the flash kernel measured 3-4x slower than XLA (docs/PERF_NOTES.md): tiny
128-lane-underfilled blocks over a 1600-cell (B*H) grid are all overhead,
and at T=257 nothing needs tiling in the first place.

This kernel instead keeps a whole frame's attention resident in VMEM:
grid over frames (``fb`` frames per cell), one block carrying all heads in
the natural packed (T, H*D) layout, and per-head dots taken through static
64-lane slices (the same Mosaic-safe pattern as ops/int8_matmul's group
slicing — no minor-dim reshapes, no transposes). Scores (T,S) live and die
in VMEM: the (B,H,T,S) score tensor that XLA materialises in HBM
(~2 GB bf16 per CLIP layer at B=100) is never written.

Per-head dots pay half-lane MXU occupancy on the d=64 contraction — that
is inherent to the head size; the win is pure HBM traffic: the kernel
moves exactly q+k+v+out = 4*T*H*D bytes per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 64  # head_dim granularity for static lane slicing

# scoped-VMEM budget for one grid cell (the remote compiler rejects ~16 MB
# working sets with HTTP 500, CLAUDE.md): q/k/v/out blocks double-buffered
# bf16 + f32 scores/probs. The formula reproduces the measured fb=4 OOM at
# CLIP shapes (est 18.9 MB vs 19.4 MB reported by the compiler).
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_est(fb: int, t: int, hd: int) -> int:
    return 4 * 2 * fb * t * hd * 2 + 2 * fb * t * t * 4


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _vit_attn_kernel(q_ref, k_ref, v_ref, out_ref, *, heads: int, d: int,
                     scale: float):
    # refs: (fb, T, H*D); per-head slices are static 64-lane windows
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[:, :, sl]  # (fb, T, d)
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (fb, T, S)
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (fb, T, d)
        out_ref[:, :, sl] = o.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _vit_attention(q, k, v, fb):
    b, t, h, d = q.shape
    hd = h * d
    packed = lambda x: x.reshape(b, t, hd)  # (B,T,H,D) -> (B,T,H*D): free
    kernel = functools.partial(
        _vit_attn_kernel, heads=h, d=d, scale=1.0 / (d ** 0.5))
    spec = pl.BlockSpec((fb, t, hd), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(b // fb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, hd), q.dtype),
        interpret=_interpret(),
    )(packed(q), packed(k), packed(v))
    return out.reshape(b, t, h, d)


def _vit_attention_fwd(q, k, v, fb):
    return _vit_attention(q, k, v, fb), (q, k, v)


def _vit_attention_bwd(fb, res, g):
    # The production user (frozen CLIP) never takes this path, but remat
    # linearization still requires a VJP to exist (a bare pallas_call broke
    # the jitted train step). Recompute through the XLA reference — same
    # math, and XLA's own transpose rules handle it.
    from handsonvlm_tpu.ops.attention import attention_xla

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: attention_xla(q, k, v, causal=False), q, k, v)
    return vjp(g)


_vit_attention.defvjp(_vit_attention_fwd, _vit_attention_bwd)


def vit_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    frames_per_block: int | None = None,
) -> jnp.ndarray:
    """Non-causal unmasked self-attention, whole-sequence-in-VMEM.

    Requires t == s, kh == h (no GQA at ViT shapes) and D == 64.
    Differentiable (backward recomputes via the XLA path).
    """
    b, t, h, d = q.shape
    assert k.shape == q.shape and v.shape == q.shape, (q.shape, k.shape)
    assert d == LANE, d
    # fb=4 VMEM-OOMs at CLIP shapes once pipelining double-buffers the
    # (fb,257,1024) blocks (19.4M > 16M scoped vmem, probed 2026-08-17)
    fb = frames_per_block or (2 if b % 2 == 0 else 1)
    while b % fb:
        fb -= 1
    while fb > 1 and _vmem_est(fb, t, h * d) > _VMEM_BUDGET:
        fb -= 1
        while b % fb:
            fb -= 1
    return _vit_attention(q, k, v, fb)


def vit_attention_ok(q, k, v, key_mask, causal: bool) -> bool:
    """Dispatch predicate: shapes this kernel serves (checked at trace time)."""
    if causal or key_mask is not None:
        return False
    if q.shape != k.shape or k.shape != v.shape:
        return False
    b, t, h, d = q.shape
    # full scores for (at least) one frame must fit the scoped-VMEM budget
    # alongside the q/k/v/out blocks, or the remote compile HTTP-500s
    return (d == LANE and 2 <= t <= 1024 and h * d % 128 == 0
            and _vmem_est(1, t, h * d) <= _VMEM_BUDGET)
