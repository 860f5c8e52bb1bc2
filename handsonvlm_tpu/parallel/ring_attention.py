"""Sequence-parallel ring attention over a mesh axis (SURVEY.md §5 stretch
goal; the reference has NO sequence parallelism — its answer to long video
is token compression, `visual_to_tokens.py:252-271`, and context is capped
at 2048. This op removes that cap for the TPU build: a sequence longer
than one device's memory/compute budget shards across the mesh).

Design (the standard blockwise-ring formulation, TPU-native):
- q, k, v are sharded on the SEQUENCE axis across `axis` (P devices hold
  (B, T/P, H, D) each).
- Each device computes attention of its local queries against the KV block
  it currently holds, accumulating with the online-softmax recurrence
  (running max m, normalizer l, weighted accumulator in f32 — the same
  math as flash attention, so the result is exact, not approximate).
- KV blocks rotate around the ring with `lax.ppermute` (nearest-neighbor
  ICI hops — the collective XLA would insert for a sharded dot would be an
  all-gather; the ring overlaps per-hop compute with the permute instead).
  After P hops every query has seen every key.
- Causal masking uses GLOBAL positions: device p's queries sit at
  p*Tl + [0, Tl); the block received at hop s originated at device
  (p - s) mod P. Fully-masked blocks still hop (the ring is a fixed
  schedule) but their contribution is exactly zero.

Inside each hop the math is plain XLA dots (fp32 softmax accumulation) —
on-chip blockwise tiling is XLA/Mosaic's job; what this module owns is the
cross-chip schedule. Differentiable end-to-end (ppermute and the scan are
both differentiable), so it serves training at long context too.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30  # matches ops/attention mask fill


def _block_attn_accum(q, k, v, m, l, acc, q_pos, k_pos, scale, causal,
                      key_mask=None):
    """One online-softmax accumulation step of q against one kv block.

    q (B, Tq, H, D); k/v (B, Tk, H, D); m/l (B, H, Tq); acc (B, H, Tq, D)
    f32. q_pos (Tq,), k_pos (Tk,) global positions for causal masking;
    key_mask (B, Tk) marks valid (non-pad) keys in this block."""
    qf = q.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32)) * scale
    if causal:
        mask = q_pos[:, None] >= k_pos[None, :]  # (Tq, Tk)
        s = jnp.where(mask[None, None], s, NEG_INF)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, NEG_INF)
    m_blk = jnp.max(s, axis=-1)  # (B, H, Tq)
    m_new = jnp.maximum(m, m_blk)
    # guard fully-masked rows-so-far: exp(NEG_INF - NEG_INF) must not be 1
    p = jnp.exp(s - m_new[..., None])
    p = jnp.where(s <= NEG_INF / 2, 0.0, p)
    corr = jnp.exp(m - m_new)
    corr = jnp.where(m <= NEG_INF / 2, 0.0, corr)
    l_new = l * corr + jnp.sum(p, axis=-1)
    acc_new = acc * corr[..., None] + jnp.einsum(
        "bhqk,bkhd->bhqd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def _ring_shard(q, k, v, key_mask, *, axis: str, causal: bool, scale: float,
                p_size: int):
    """Per-shard body (runs under shard_map): q/k/v (B, Tl, H, D) local;
    key_mask (B, Tl) local or None (it rotates with its kv block)."""
    b, tl, h, d = q.shape
    kv_h = k.shape[2]
    groups = h // kv_h  # GQA: kv blocks ride the ring UNREPEATED (1/groups
    # the traffic); heads are repeated per hop for the einsum, like
    # attention_xla's _repeat_kv
    my = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]
    q_pos = my * tl + jnp.arange(tl)

    m = jnp.full((b, h, tl), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, tl), jnp.float32)
    acc = jnp.zeros((b, h, tl, d), jnp.float32)

    for step in range(p_size):  # static: p_size is the mesh-axis size
        src = (my - step) % p_size  # block's home device = global offset
        k_pos = src * tl + jnp.arange(tl)
        kk, vv = k, v
        if groups > 1:
            kk = jnp.repeat(k, groups, axis=2)
            vv = jnp.repeat(v, groups, axis=2)
        m, l, acc = _block_attn_accum(
            q, kk, vv, m, l, acc, q_pos, k_pos, scale, causal,
            key_mask=key_mask,
        )
        if step != p_size - 1:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            if key_mask is not None:
                key_mask = jax.lax.ppermute(key_mask, axis, perm)

    out = acc / jnp.maximum(l, 1e-30)[..., None]  # (B, H, Tl, D)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, Tl, H, D)


def ring_attention(
    q: jnp.ndarray,  # (B, T, H, D) — T sharded on `axis` under jit/GSPMD
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = True,
    key_mask: Optional[jnp.ndarray] = None,  # (B, T) valid-key mask
    batch_axis: Optional[str] = None,  # e.g. 'data' to compose DP x SP
) -> jnp.ndarray:
    """Exact attention over a sequence sharded across `axis`.

    Call under jit with q/k/v sharded P(batch_axis, axis, None, None); the
    shard_map keeps that sharding and rotates KV (and key_mask) with
    nearest-neighbor ppermute. T must divide the axis size. Differentiable.
    NB: rows whose keys are ALL masked return 0 (attention_xla returns the
    uniform average there) — such rows are pad positions whose outputs are
    ignored downstream."""
    b, t, h, d = q.shape
    p_size = int(mesh.shape[axis])
    if t % p_size:
        raise ValueError(f"T={t} must divide the '{axis}' axis ({p_size})")
    scale = 1.0 / (d ** 0.5)
    body = functools.partial(
        _ring_shard, axis=axis, causal=causal, scale=scale, p_size=p_size
    )
    spec = P(batch_axis, axis, None, None)
    mspec = P(batch_axis, axis)
    if key_mask is None:
        fn = jax.shard_map(
            lambda a, b_, c: body(a, b_, c, None), mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec,
        )
        return fn(q, k, v)
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec
    )
    return fn(q, k, v, key_mask)
