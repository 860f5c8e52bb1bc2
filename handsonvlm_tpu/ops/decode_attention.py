"""Pallas KV-cache decode attention (single-query flash attention).

The second kernel from the build plan (SURVEY.md §7 "kernels/: ...
kv_cache_decode_attn"). One query position attends over a long cache:

- operates directly on the cache layout (B, S, K, D) — no per-step
  transposes of the 0.5 GB cache;
- all heads of one batch element are processed together: the (H, D) query
  block multiplies each (block_k, D) key block per head group, keeping the
  MXU busy even at batch 1;
- blocks whose positions are entirely >= the cache length are skipped via
  the blockwise online-softmax predicate, so cost tracks the *filled*
  cache, not the allocation.

Numerics: fp32 online softmax, identical results to ops.attention (tested).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_K = 256
# Largest speculative-verify window served by the stacked kernel (bounds
# the (H*T, D) accumulator scratch: 32 heads x 8 x 128 x 4 B = 128 KiB).
MAX_T_WINDOW = 8


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _decode_kernel(
    length_ref,  # SMEM (1,1) int32: number of valid cache positions
    q_ref,  # (1, H, D)
    k_ref,  # (1, block_k, K, D)
    v_ref,  # (1, block_k, K, D)
    mask_ref,  # (1, 1, block_k) int32
    out_ref,  # (1, H, D)
    acc_ref,  # scratch (H, D) f32
    m_ref,  # scratch (H, 1) f32
    l_ref,  # scratch (H, 1) f32
    *,
    scale: float,
    block_k: int,
    groups: int,  # H // K query heads per kv head
):
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = length_ref[0, 0]
    run = ki * block_k < length

    @pl.when(run)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (H, D)
        k = k_ref[0].astype(jnp.float32)  # (bk, K, D)
        v = v_ref[0].astype(jnp.float32)
        h, d = q.shape
        kh = k.shape[1]
        # group query heads by kv head: (K, groups, D) x (K, bk, D)
        qg = q.reshape(kh, groups, d)
        kg = jnp.transpose(k, (1, 0, 2))  # (K, bk, D)
        s = jax.lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, groups, bk)
        s = s.reshape(h, -1) * scale  # (H, bk)

        pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (h, block_k), 1)
        ok = (pos < length) & (mask_ref[0, 0] > 0)[None, :]
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # masked probs zeroed explicitly: a fully-masked block would
        # otherwise add p = exp(NEG_INF - NEG_INF) = 1 per key
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)  # (H, bk)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        vg = jnp.transpose(v, (1, 0, 2))  # (K, bk, D)
        pg = p.reshape(kh, groups, -1)
        o = jax.lax.dot_general(
            pg, vg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, groups, D)
        acc_ref[:] = acc_ref[:] * corr + o.reshape(h, d)
        m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = (acc_ref[:] / l_safe).astype(out_ref.dtype)


def _decode_stacked_kernel(
    s_ref,  # scalar prefetch (2+B+B*nk,) int32:
    #         [layer_idx, length, counts(B), block_table(B*nk)]
    q_ref,  # (1, T, H, D); T=1 for plain decode, small T for spec verify
    k_ref,  # (1, 1, block_k, K, D) — block of the FULL (L,B,S,K,D) cache
    v_ref,
    *rest,  # [ks_ref, vs_ref,] mask_ref, out_ref, acc_ref, m_ref, l_ref
    scale: float,
    block_k: int,
    groups: int,
    batch: int,
    nk: int,
    t_window: int = 1,
    quant: bool = False,
):
    """One online-softmax block step over one layer of the stacked cache.

    With ``quant`` the cache blocks are int8 and two extra (1,1,K,block_k)
    f32 scale refs follow v_ref; dequantization is exact and transpose-free
    (k-scales multiply the score rows — q.k8*ks == (q.k8)*ks — and
    v-scales fold into the probabilities — (p*vs).v8 == p.(v8*vs)).

    With ``t_window`` > 1 (speculative verify) the T query rows share one
    pass over the cache (the cache is DMA'd ONCE per window, not per
    token); the window's own kv rows are already written at positions
    length-T..length-1, and row tq attends causally up to
    length - (T-1-tq). Score rows are laid out (kv_head, group, T)."""
    if quant:
        ks_ref, vs_ref, mask_ref, out_ref, acc_ref, m_ref, l_ref = rest
    else:
        mask_ref, out_ref, acc_ref, m_ref, l_ref = rest
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    tw = t_window

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = s_ref[1]
    # per-row COMPACTED block sweep: the scalar-prefetched table lists, for
    # each row, the indices of cache blocks holding >=1 valid key (leading
    # pad, interior holes — other requests' prompt buckets in continuous
    # batching — and the unfilled tail all excluded), padded by repeating
    # the last valid entry (repeat = no new DMA). DMA therefore tracks the
    # row's VALID bytes, not the swept allocation, under any fragmentation.
    # Steps at ki >= count (and every step of an idle all-masked row,
    # count == 0) skip compute; position math uses the mapped block index
    # vk, never ki.
    bi = pl.program_id(0)
    count = s_ref[2 + bi]
    vk = s_ref[2 + batch + bi * nk + ki]
    run = ki < count

    @pl.when(run)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # (T, H, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (bk, K, D)
        v = v_ref[0, 0].astype(jnp.float32)
        t, h, d = q.shape
        kh = k.shape[1]
        rows = groups * t  # score rows per kv head, laid out (group, tq)
        # (T,H,D) -> (H,T,D) -> (kh, groups*T, D): within a kv head, row
        # r = g*T + tq
        qg = jnp.transpose(q, (1, 0, 2)).reshape(kh, rows, d)
        kg = jnp.transpose(k, (1, 0, 2))  # (K, bk, D)
        s = jax.lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, rows, bk)
        if quant:
            s = s * ks_ref[0, 0][:, None, :]  # dequantize k on score rows
        s = s * scale

        pos = vk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (kh, rows, block_k), 2)
        ok = pos < length
        if tw > 1:
            # per-row causal limit: row (g, tq) sees positions
            # < length - (T-1-tq); iota over the tq sub-axis avoids an
            # integer mod (Mosaic has no i32 remainder lowering guarantee)
            tq = jax.lax.broadcasted_iota(
                jnp.int32, (kh, groups, tw, block_k), 2).reshape(
                kh, rows, block_k)
            ok = pos < (length - (tw - 1) + tq)
        ok &= (mask_ref[0, 0] > 0)[None, None, :]
        s = jnp.where(ok, s, NEG_INF)

        s2 = s.reshape(kh * rows, block_k)
        ok2 = ok.reshape(kh * rows, block_k)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        # zero masked probs explicitly: a fully-masked block (all s == NEG_INF
        # == m_new) would otherwise yield p = exp(0) = 1 per key and emit the
        # v-block mean for rows with no valid keys in this block
        p = jnp.where(ok2, jnp.exp(s2 - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        vg = jnp.transpose(v, (1, 0, 2))
        pg = p.reshape(kh, rows, block_k)
        if quant:
            pg = pg * vs_ref[0, 0][:, None, :]  # fold v scales in
        o = jax.lax.dot_general(
            pg, vg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, rows, D)
        acc_ref[:] = acc_ref[:] * corr + o.reshape(kh * rows, d)
        m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        acc = acc_ref[:] / l_safe  # (kh*groups*T, D)
        kh = out_ref.shape[2] // groups
        d = out_ref.shape[3]
        # rows (kh, groups, T, D) -> out (T, H=kh*groups, D)
        o = acc.reshape(kh, groups, tw, d)
        o = jnp.transpose(o, (2, 0, 1, 3)).reshape(tw, kh * groups, d)
        out_ref[0] = o.astype(out_ref.dtype)


def stacked_kernel_ok(s: int) -> bool:
    """Mosaic requires the mask block's last dim (block_k) divisible by 128
    (measured failure at block_k=64, S=832); callers fall back to the
    fused-slice XLA path when no 128-multiple block divides S. Cache
    allocations should be rounded to 256 (infer/sampler.py) so this is
    always true in production."""
    return _interpret() or s % 128 == 0


def _pick_stacked_block(s: int, want: int) -> int:
    """Largest 128-multiple divisor of s that is <= want (interpret mode
    relaxes to small blocks for tests)."""
    if _interpret():
        bk = min(want, s)
        while bk > 8 and s % bk:
            bk //= 2
        return max(bk, 8)
    bk = want
    while bk > 128 and s % bk:
        bk //= 2
    return bk


def _stacked_call(q, ck, cv, layer_idx, length, key_mask, block_k,
                  scales=None):
    """Shared pallas_call builder for the bf16 and int8 stacked-cache
    decode kernels (the only differences are the two scale operands and
    the quant flag). q may be (B,H,D), (B,1,H,D), or a small window
    (B,T,H,D) for speculative verify — T rows share ONE pass over the
    cache blocks."""
    squeeze = None
    if q.ndim == 3:
        squeeze = "3d"
        q = q[:, None]
    b, tw, h, d = q.shape
    sx = ck.shape[2]
    kh = ck.shape[3]
    groups = h // kh
    scale = float(1.0 / (d**0.5))

    block_k = _pick_stacked_block(sx, min(block_k, sx))
    nk = _cdiv(sx, block_k)
    length_s = jnp.asarray(length, jnp.int32).reshape(())
    if key_mask is None:
        key_mask = jnp.ones((b, sx), bool)
    mask = key_mask.astype(jnp.int32)[:, None, :]

    # Compacted per-row block table: list each row's valid blocks (>=1 valid
    # key AND within the filled length) in order, pad by repeating the last
    # valid entry (a repeated index is no new DMA; those steps skip compute
    # via ki >= count). Fragmented masks — continuous batching's interleaved
    # prompt buckets, left padding — cost DMA only for their VALID blocks.
    pad = nk * block_k - sx
    km = jnp.pad(key_mask, [(0, 0), (0, pad)]) if pad else key_mask
    bvalid = km.reshape(b, nk, block_k).any(axis=-1)
    bvalid &= (jnp.arange(nk, dtype=jnp.int32) * block_k < length_s)[None, :]
    counts = jnp.sum(bvalid, axis=-1, dtype=jnp.int32)  # (B,)
    order = jnp.argsort(~bvalid, axis=1).astype(jnp.int32)  # stable: valid first
    clamp = jnp.minimum(jnp.arange(nk, dtype=jnp.int32)[None, :],
                        jnp.maximum(counts[:, None] - 1, 0))
    table = jnp.take_along_axis(order, clamp, axis=1)  # (B, nk)

    scalars = jnp.concatenate([
        jnp.stack([jnp.asarray(layer_idx, jnp.int32).reshape(()), length_s]),
        counts,
        table.reshape(-1),
    ])

    def _kblock(b_, ki, sref):
        # the row's ki-th valid block; steps past the row's count repeat the
        # last valid block (no new DMA) and are skipped by the in-kernel
        # predicate
        return sref[2 + b + b_ * nk + ki]

    cache_spec = pl.BlockSpec(
        (1, 1, block_k, kh, d),
        lambda b_, ki, sref: (sref[0], b_, _kblock(b_, ki, sref), 0, 0),
    )
    scale_spec = pl.BlockSpec(
        (1, 1, kh, block_k),
        lambda b_, ki, sref: (sref[0], b_, 0, _kblock(b_, ki, sref)),
    )
    in_specs = [
        pl.BlockSpec((1, tw, h, d), lambda b_, ki, sref: (b_, 0, 0, 0)),
        cache_spec,
        cache_spec,
    ]
    operands = [q, ck, cv]
    if scales is not None:
        in_specs += [scale_spec, scale_spec]
        operands += list(scales)
    in_specs.append(
        pl.BlockSpec((1, 1, block_k),
                     lambda b_, ki, sref: (b_, 0, _kblock(b_, ki, sref)))
    )
    operands.append(mask)

    kernel = functools.partial(
        _decode_stacked_kernel, scale=scale, block_k=block_k, groups=groups,
        batch=b, nk=nk, t_window=tw, quant=scales is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nk),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, tw, h, d), lambda b_, ki, sref: (b_, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((h * tw, d), jnp.float32),
                pltpu.VMEM((h * tw, 1), jnp.float32),
                pltpu.VMEM((h * tw, 1), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, tw, h, d), q.dtype)],
        interpret=_interpret(),
    )(scalars, *operands)[0]
    return out[:, 0] if squeeze else out


def decode_attention_stacked(
    q: jnp.ndarray,  # (B, T, H, D) (T<=MAX_T_WINDOW) or (B, H, D)
    ck: jnp.ndarray,  # (L, B, S, K, D) FULL stacked cache (scan carry)
    cv: jnp.ndarray,
    layer_idx,  # scalar int: which layer's cache to attend over
    length,  # scalar int: valid cache positions INCLUDING the T window
    #          rows already written at length-T..length-1 (cache_index + T);
    #          window row tq attends causally up to length - (T-1-tq)
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Single-position attention over one layer of the FULL stacked cache.

    For use inside the decoder's layer scan with the cache kept whole in the
    carry: the layer is selected by a scalar-prefetched index in the
    BlockSpec index_map, so the kernel DMAs only that layer's blocks.
    XLA-slicing the layer out (`dynamic_index_in_dim`) before a pallas call
    materializes the (B,S,K,D) slice as a COPY per layer per step — measured
    25-32 ms/step at 7B int4 B=8 S=832 vs ~4.7 GB/step of true cache reads
    (tools/perf_batch_step.py; same root cause as the int4 stacked-weight
    fix in ops/int8_matmul.int4_matmul_stacked).

    Each row sweeps a COMPACTED table of its valid cache blocks (scalar
    prefetch): blocks past `length`, fully key-masked holes (continuous
    batching: other requests' prompt buckets), and leading pad are never
    DMA'd — cost tracks each row's *valid* keys, not the allocation.

    Numerics: fp32 online softmax, identical to ops.attention (tested).
    """
    return _stacked_call(q, ck, cv, layer_idx, length, key_mask, block_k)


def decode_attention_stacked_q(
    q: jnp.ndarray,  # (B, 1, H, D) or (B, H, D)
    ck: jnp.ndarray,  # (L, B, S, K, D) int8 stacked cache
    cv: jnp.ndarray,
    ks: jnp.ndarray,  # (L, B, K, S) f32 per-(token, head) scales
    vs: jnp.ndarray,
    layer_idx,
    length,
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """decode_attention_stacked over an int8-quantized cache (halves the
    per-step cache DMA — the dominant decode-attention cost at batch; see
    docs/PERF_NOTES.md) with exact per-token-per-head dequantization."""
    return _stacked_call(
        q, ck, cv, layer_idx, length, key_mask, block_k, scales=(ks, vs)
    )


def decode_attention(
    q: jnp.ndarray,  # (B, 1, H, D) or (B, H, D)
    k: jnp.ndarray,  # (B, S, K, D) cache
    v: jnp.ndarray,
    length,  # scalar int: valid cache positions (cache_index + 1)
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Single-position cached attention. Returns the same rank as q."""
    squeeze = q.ndim == 4
    if squeeze:
        assert q.shape[1] == 1
        q = q[:, 0]
    b, h, d = q.shape
    s = k.shape[1]
    kh = k.shape[2]
    groups = h // kh
    scale = float(1.0 / (d**0.5))

    block_k = min(block_k, max(s, 8))
    s_pad = _cdiv(s, block_k) * block_k
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if key_mask is None:
        key_mask = jnp.ones((b, s), bool)
    mask = jnp.pad(key_mask.astype(jnp.int32), [(0, 0), (0, s_pad - s)])[:, None, :]

    length_arr = jnp.asarray(length, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _decode_kernel, scale=scale, block_k=block_k, groups=groups
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, _cdiv(s_pad, block_k)),
            in_specs=[
                pl.BlockSpec((1, 1), lambda b_, ki: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, d), lambda b_, ki: (b_, 0, 0)),
                pl.BlockSpec((1, block_k, kh, d), lambda b_, ki: (b_, ki, 0, 0)),
                pl.BlockSpec((1, block_k, kh, d), lambda b_, ki: (b_, ki, 0, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, ki: (b_, 0, ki)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, d), lambda b_, ki: (b_, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((h, d), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, d), q.dtype)],
        interpret=_interpret(),
    )(length_arr, q, k, v, mask)[0]
    return out[:, None] if squeeze else out
