"""Blockwise flash attention as Pallas TPU kernels (forward + backward).

TPU-native replacement for the reference's CUDA flash-attn monkey patch
(llava/train/llama_flash_attn_monkey_patch.py:19-125, flash-attn 2.6.3).
Online-softmax forward saves per-row logsumexp; the backward recomputes
probabilities blockwise (FlashAttention-2 style) in two kernels (dq and
dk/dv), so no (T,S) matrix ever materialises in HBM.

Interface matches ops.attention.attention_xla: q (B,T,H,D), k/v (B,S,K,D),
optional boolean key mask (B,S), causal flag, scalar q_offset (absolute
position of q[:,0], for cached decode). fp32 accumulation throughout;
inputs may be bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests/sim meshes)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    qoff_ref,  # SMEM (1,1) int32: absolute position of q row 0
    q_ref,  # (1, block_q, D)
    k_ref,  # (1, block_k, D)
    v_ref,  # (1, block_k, D)
    mask_ref,  # (1, 1, block_k) int32 key validity
    out_ref,  # (1, 1, block_q, D)
    lse_ref,  # (1, 1, 1, block_q)
    acc_ref,  # scratch (block_q, D) f32
    m_ref,  # scratch (block_q, 1) f32
    l_ref,  # scratch (block_q, 1) f32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    qoff = qoff_ref[0, 0]

    run_block = True
    if causal:
        # whole block above the diagonal contributes nothing
        first_q_abs = qi * block_q + qoff
        last_q_abs = first_q_abs + block_q - 1
        run_block = last_q_abs >= ki * block_k

    @pl.when(run_block)
    def _compute():
        # dots take the INPUT dtype (bf16 on TPU) with f32 accumulation:
        # f32xf32 MXU passes are ~8x slower and were why this kernel lost
        # to XLA below T~1024 (docs/PERF_NOTES.md). Softmax math stays f32.
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale

        key_ok = (mask_ref[0, 0] > 0)[None, :]
        s = jnp.where(key_ok, s, NEG_INF)
        if causal:
            s = jnp.where(q_pos + qoff >= k_pos, s, NEG_INF)

        m_prev = m_ref[:]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # rows that are all -inf give exp(NEG_INF-m)=0
        correction = jnp.exp(m_prev - m_new)
        l_new = l_ref[:] * correction + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_ref[:] / l_safe).astype(out_ref.dtype)
        lse = m_ref[:] + jnp.log(l_safe)
        lse_ref[0, 0, 0] = jnp.where(l[:, 0] == 0.0, NEG_INF, lse[:, 0])


def _fwd_call(q, k, v, key_mask_i32, q_offset, *, causal, scale, block_q, block_k):
    """q (B,H,T,D); k,v (B,H,S,D); key_mask (B,S) int32. Returns out, lse."""
    b, h, t, d = q.shape
    s = k.shape[2]
    grid = (b, h, _cdiv(t, block_q), _cdiv(s, block_k))
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale, block_q=block_q, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda b_, h_, qi, ki: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, h_, qi, ki: (b_, 0, ki)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, qi, ki: (b_, h_, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, t), jnp.float32),
        ],
        interpret=_interpret(),
    )(qoff, q, k, v, key_mask_i32[:, None, :])
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_acc, *, causal, scale, block_q, block_k,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qoff = qoff_ref[0, 0]
    run_block = True
    if causal:
        run_block = (qi * block_q + qoff + block_q - 1) >= ki * block_k

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0][:, None]
        delta = delta_ref[0, 0, 0][:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        key_ok = (mask_ref[0, 0] > 0)[None, :]
        s = jnp.where(key_ok, s, NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_pos + qoff >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_acc[:] += jax.lax.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qoff_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, causal, scale, block_q, block_k,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qoff = qoff_ref[0, 0]
    run_block = True
    if causal:
        run_block = (qi * block_q + qoff + block_q - 1) >= ki * block_k

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0][:, None]
        delta = delta_ref[0, 0, 0][:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        key_ok = (mask_ref[0, 0] > 0)[None, :]
        s = jnp.where(key_ok, s, NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_pos + qoff >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse)  # (bq, bk) f32
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale  # (bq, bk)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, key_mask_i32, q_offset, causal, scale, block_q, block_k):
    out, _ = _fwd_call(
        q, k, v, key_mask_i32, q_offset,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
    )
    return out


def _flash_fwd(q, k, v, key_mask_i32, q_offset, causal, scale, block_q, block_k):
    out, lse = _fwd_call(
        q, k, v, key_mask_i32, q_offset,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
    )
    return out, (q, k, v, key_mask_i32, q_offset, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, res, g):
    q, k, v, key_mask_i32, q_offset, out, lse = res
    b, h, t, d = q.shape
    s = k.shape[2]
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1, 1)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)[:, :, None, :]  # (B,H,1,T)

    smem = pl.BlockSpec((1, 1), lambda *a: (0, 0), memory_space=pltpu.SMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, causal=causal, scale=scale, block_q=block_q, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h, _cdiv(t, block_q), _cdiv(s, block_k)),
            in_specs=[
                smem,
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, h_, qi, ki: (b_, 0, ki)),
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, qi, ki: (b_, h_, 0, qi)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, qi, ki: (b_, h_, 0, qi)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        interpret=_interpret(),
    )(qoff, q, k, v, key_mask_i32[:, None, :], g, lse, delta)[0]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal=causal, scale=scale, block_q=block_q, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h, _cdiv(s, block_k), _cdiv(t, block_q)),
            in_specs=[
                smem,
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, h_, ki, qi: (b_, 0, ki)),
                pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ki, qi: (b_, h_, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ki, qi: (b_, h_, 0, qi)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ki, qi: (b_, h_, 0, qi)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, ki, qi: (b_, h_, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
    )(qoff, q, k, v, key_mask_i32[:, None, :], g, lse, delta)

    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,  # (B, T, H, D)
    k: jnp.ndarray,  # (B, S, K, D)
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, S) bool
    causal: bool = True,
    q_offset=0,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,  # unused; kept for API compat
) -> jnp.ndarray:
    b, t, h, d = q.shape
    _, s, kh, _ = k.shape
    scale = float(1.0 / (d**0.5))

    if kh != h:  # GQA: repeat kv heads (MHA for vicuna, so usually no-op)
        rep = h // kh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    # layout: (B, H, T, D)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    block_q = min(block_q, max(t, 8))
    block_k = min(block_k, max(s, 8))
    t_pad = _cdiv(t, block_q) * block_q
    s_pad = _cdiv(s, block_k) * block_k
    qt = _pad_to(qt, t_pad, 2)
    kt = _pad_to(kt, s_pad, 2)
    vt = _pad_to(vt, s_pad, 2)

    if key_mask is None:
        key_mask = jnp.ones((b, s), bool)
    mask_i32 = _pad_to(key_mask.astype(jnp.int32), s_pad, 1)

    out = _flash(qt, kt, vt, mask_i32, q_offset, causal, scale, block_q, block_k)
    out = out[:, :, :t, :]
    return jnp.transpose(out, (0, 2, 1, 3))
