"""Attention dispatch: XLA reference implementation + Pallas kernels.

The reference reaches flash-attention through a monkey patch over HF LLaMA
(llava/train/llama_flash_attn_monkey_patch.py). Here attention is a
first-class op with three interchangeable implementations:

- ``xla``    — naive fp32-softmax attention (always available; ground truth
               for kernel parity tests).
- ``flash``  — Pallas blockwise flash-attention (TPU; ops/flash_attention.py).
- ``auto``   — flash on TPU when shapes allow, else xla.

All take q:(B,T,H,D), k/v:(B,S,K,D) with optional boolean key mask (B,S) and
causal masking, and return (B,T,H,D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B,S,K,D) -> (B,S,K*n_rep,D) for grouped-query attention."""
    if n_rep == 1:
        return x
    b, s, k, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, k, n_rep, d)).reshape(
        b, s, k * n_rep, d
    )


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    q_offset=0,
) -> jnp.ndarray:
    """Reference attention; softmax accumulated in fp32.

    ``q_offset`` is the absolute position of q[.,0] (scalar or (B,) array),
    used for causal masking during cached decode.
    """
    b, t, h, d = q.shape
    _, s, kh, _ = k.shape
    if kh != h:
        k = _repeat_kv(k, h // kh)
        v = _repeat_kv(v, h // kh)

    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    # (B,H,T,S)
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale

    bias = jnp.zeros((b, 1, t, s), dtype=jnp.float32)
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :], bias, NEG_INF)
    if causal:
        q_pos = jnp.arange(t)[None, :] + jnp.asarray(q_offset).reshape(-1, 1)
        k_pos = jnp.arange(s)
        causal_ok = q_pos[:, :, None] >= k_pos[None, None, :]
        bias = jnp.where(causal_ok[:, None, :, :], bias, NEG_INF)

    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    q_offset=0,
    impl: str = "auto",
    decode_length=None,
) -> jnp.ndarray:
    """Attention entry point used by all models.

    `decode_length` (valid cache positions, = q_offset + T) enables the
    Pallas single-query decode kernel for cached T==1 steps."""
    if impl == "auto":
        impl = _best_impl(q, decode_length, key_mask=key_mask, causal=causal,
                          kv_shape=k.shape)
    if impl == "vit":
        from handsonvlm_tpu.ops.vit_attention import vit_attention

        return vit_attention(q, k, v)
    if impl == "decode":
        from handsonvlm_tpu.ops.decode_attention import decode_attention

        return decode_attention(q, k, v, decode_length, key_mask=key_mask)
    if impl == "flash":
        from handsonvlm_tpu.ops.flash_attention import flash_attention

        # block (256, 512) measured 9x faster than (128, 128) at T=2048
        # d=128 (tools/perf_attn_shapes.py, 2026-08-16); smaller T pads up
        t = q.shape[1]
        block_q, block_k = (256, 512) if t >= 2048 else (128, 128)
        return flash_attention(
            q, k, v, key_mask=key_mask, causal=causal, q_offset=q_offset,
            block_q=block_q, block_k=block_k,
        )
    return attention_xla(q, k, v, key_mask=key_mask, causal=causal, q_offset=q_offset)


def _best_impl(q: jnp.ndarray, decode_length=None, *, key_mask=None,
               causal=True, kv_shape=None) -> str:
    """Measured on v5e (tools/perf_attn_shapes.py, 2026-08-16, after the
    bf16-operand kernel fix — the old kernel ran f32 MXU passes): per-layer
    attention at llama shapes (B=1, H=32, D=128): T=2048 flash(256,512)
    0.35 ms vs XLA 4.13; T=1024 0.20 vs 0.14 (wash); T=512 wash. CLIP
    shapes (B=100, T=257, D=64, non-causal): XLA wins below T~2048 at
    d=128 vs flash, but the VMEM-resident ViT kernel wins at batch
    (tools/perf_vit_attn.py, 2026-08-17, K=2000 chains): B=100 0.854 vs
    XLA 2.417 ms/layer, B=40 0.351 vs 0.823. The standalone B=10 numbers
    (XLA 0.055 vs vit 0.089) were misleading: IN-CONTEXT, inside the full
    CLIP encoder, the same A/B is vit 13.34 vs XLA 14.5 ms/encode
    (tools/perf_clip_breakdown.py PERF_IMPLS=xla,vit,xla, 2026-08-18 —
    XLA's materialized f32 score tensors cost more when interleaved with
    the GEMM stream than alone), so the vit route is gated at B>=8
    (below that the whole encode is sub-ms and not worth a kernel)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    b, t, h, d = q.shape
    if platform != "tpu":
        return "xla"
    if t == 1 and decode_length is not None and d % 8 == 0:
        return "decode"
    if kv_shape is not None and kv_shape == q.shape and q.shape[0] >= 8:
        from handsonvlm_tpu.ops.vit_attention import vit_attention_ok

        if vit_attention_ok(q, q, q, key_mask, causal):
            return "vit"
    if t >= 2048 and d in (128, 256):
        return "flash"
    return "xla"
