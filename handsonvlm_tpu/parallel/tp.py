"""Tensor-parallel composition of the Pallas kernels via shard_map.

GSPMD partitions XLA ops automatically, but a `pallas_call` is opaque to the
partitioner: under a ('data','model') mesh it runs replicated (each device
all-gathers the operands and does the full computation). `jax.shard_map`
splits the operands along the `model` axis and runs the single-device kernel
on each shard:

- decode attention: query heads / kv heads are embarrassingly parallel —
  each device attends its local head group over its local slice of the
  stacked cache, no collectives (SURVEY.md §2.5 TP row; the reference has no
  TP at all — `scripts/finetune.sh` is pure ZeRO-3 data parallel).
- int4 GEMV: output columns are embarrassingly parallel — each device holds
  a (L, G, g/2, n/tp) shard of the packed weights and computes its slice of
  the output (classic column-parallel Megatron layout). The activation is
  small (1 row at decode) and rides in replicated.

Column-parallel note: the fused wqkv/wgu concat is sharded across the FULL
concatenated output dim, so a shard boundary can fall inside q/k/v. That is
still correct — downstream slices see one logical array and GSPMD inserts
the resharding — it just means head-aligned layouts (quantize per shard)
are a further optimization for real multi-chip serving.

Shapes that don't divide the axis fall back to the unsharded kernel (which
GSPMD then runs replicated), so these wrappers are safe to call
unconditionally when a mesh is supplied.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked
from handsonvlm_tpu.ops.int8_matmul import _interpret, int4_matmul_stacked


def tp_size(mesh: Optional[Mesh], axis: str = "model") -> int:
    """Size of the tensor-parallel axis (1 when absent/no mesh)."""
    if mesh is None:
        return 1
    try:
        return int(mesh.shape.get(axis, 1))
    except Exception:
        return 1


def decode_attention_stacked_tp(
    q: jnp.ndarray,  # (B, T<=8, H, D) or (B, H, D)
    ck: jnp.ndarray,  # (L, B, S, K, D) full stacked cache
    cv: jnp.ndarray,
    layer_idx,
    length,
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, S)
    mesh: Optional[Mesh] = None,
    axis: str = "model",
) -> jnp.ndarray:
    """Head-sharded single-position attention over one stacked-cache layer.

    Query heads H and kv heads K both split over the `axis` mesh dim; each
    device runs the Pallas kernel on its head group. The GQA group ratio
    H//K is preserved on every shard, so the kernel math is unchanged.
    """
    tp = tp_size(mesh, axis)
    h = q.shape[-2]
    kh = ck.shape[3]
    if tp == 1 or h % tp or kh % tp:
        return decode_attention_stacked(
            q, ck, cv, layer_idx, length, key_mask=key_mask
        )

    # normalize to a (B, T, H, D) window (T=1 for plain decode; small T
    # for speculative verify) and shard the head dim
    expand = q.ndim == 3
    if expand:
        q = q[:, None]
    b, s = ck.shape[1], ck.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, s), bool)

    def local(q_, ck_, cv_, li_, ln_, mask_):
        return decode_attention_stacked(q_, ck_, cv_, li_, ln_, key_mask=mask_)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),  # q (B, T, H, D): heads
            P(None, None, None, axis, None),  # cache: kv heads
            P(None, None, None, axis, None),
            P(),  # layer_idx scalar
            P(),  # length scalar
            P(None, None),  # key mask replicated
        ),
        out_specs=P(None, None, axis, None),
        check_vma=False,  # pallas_call outputs carry no vma type info
    )(
        q, ck, cv,
        jnp.asarray(layer_idx, jnp.int32),
        jnp.asarray(length, jnp.int32),
        key_mask,
    )
    return out[:, 0] if expand else out


def decode_attention_stacked_q_tp(
    q: jnp.ndarray,  # (B, T<=8, H, D) or (B, H, D)
    ck: jnp.ndarray,  # (L, B, S, K, D) int8 stacked cache
    cv: jnp.ndarray,
    ks: jnp.ndarray,  # (L, B, K, S) f32 scales
    vs: jnp.ndarray,
    layer_idx,
    length,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
) -> jnp.ndarray:
    """Head-sharded decode_attention_stacked_q (int8 cache): query heads,
    kv heads AND the per-head scale arrays all split over `axis` — the
    per-shard kernel math is unchanged (scales are per kv-head)."""
    from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked_q

    tp = tp_size(mesh, axis)
    h = q.shape[-2]
    kh = ck.shape[3]
    if tp == 1 or h % tp or kh % tp:
        return decode_attention_stacked_q(
            q, ck, cv, ks, vs, layer_idx, length, key_mask=key_mask
        )

    expand = q.ndim == 3
    if expand:
        q = q[:, None]
    b, s = ck.shape[1], ck.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, s), bool)

    def local(q_, ck_, cv_, ks_, vs_, li_, ln_, mask_):
        return decode_attention_stacked_q(
            q_, ck_, cv_, ks_, vs_, li_, ln_, key_mask=mask_)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),  # q (B, T, H, D): heads
            P(None, None, None, axis, None),  # cache: kv heads
            P(None, None, None, axis, None),
            P(None, None, axis, None),  # scales (L, B, K, S): kv heads
            P(None, None, axis, None),
            P(),
            P(),
            P(None, None),
        ),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )(
        q, ck, cv, ks, vs,
        jnp.asarray(layer_idx, jnp.int32),
        jnp.asarray(length, jnp.int32),
        key_mask,
    )
    return out[:, 0] if expand else out


def int4_matmul_stacked_tp(
    x: jnp.ndarray,  # (..., d)
    w4_all: jnp.ndarray,  # (L, G, g/2, n) nibble-packed
    gs_all: jnp.ndarray,  # (L, G, n)
    layer_idx,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
) -> jnp.ndarray:
    """Column-parallel stacked int4 matmul: each device holds n/tp packed
    output columns and computes its output slice from the replicated
    activation — no collectives in the op itself (the classic Megatron
    column-parallel layout, but weight-only-quantized)."""
    tp = tp_size(mesh, axis)
    tiled = w4_all.ndim == 5  # (L, NB, G, g/2, BN) tile_int4_stacked layout
    if tiled:
        nblocks = w4_all.shape[1]
        ok = tp > 1 and nblocks % tp == 0
        wspec = P(None, axis, None, None, None)
        gspec = P(None, axis, None, None)
    else:
        n = w4_all.shape[-1]
        # local column count must still satisfy the kernel's lane-blocking
        # rules (any block size works in interpret mode — CPU-mesh tests)
        ok = tp > 1 and n % tp == 0 and (_interpret() or (n // tp) % 128 == 0)
        wspec = P(None, None, None, axis)
        gspec = P(None, None, axis)
    if not ok:
        return int4_matmul_stacked(x, w4_all, gs_all, layer_idx)

    nb = x.ndim - 1
    xspec = P(*([None] * x.ndim))

    def local(x_, w4_, gs_, li_):
        return int4_matmul_stacked(x_, w4_, gs_, li_)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, wspec, gspec, P()),
        out_specs=P(*([None] * nb), axis),
        check_vma=False,  # pallas_call outputs carry no vma type info
    )(x, w4_all, gs_all, jnp.asarray(layer_idx, jnp.int32))
