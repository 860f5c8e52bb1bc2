"""Fused int8-base + LoRA-epilogue stacked matmuls (the QLoRA training path).

Why this exists (docs/PERF_NOTES.md "Adapter-tax follow-ups", round 4): the
7B int8-base QLoRA step pays a ~46 ms/step adapter tax that is
dtype-INsensitive — not dot compute but the HBM traffic + scheduling of the
full-width f32 LoRA deltas (~3.8 GB/pass of `(x@A)@B` outputs materialised
and re-read for the add) interleaved with every base GEMM. The bounded fix
is epilogue fusion: accumulate the low-rank delta INSIDE the quantized
GEMM's output tile, so the delta never exists in HBM.

Design (mirrors ops/int8_matmul's int4 stacked machinery):

- The stacked int8 projections ``w8_all (L, d, n) int8`` + per-output-column
  ``s_all (L, n) f32`` are layer-scan CONSTANTS selected by a
  scalar-prefetched layer index in the BlockSpec index_map — scan-slicing a
  pallas operand materialises a copy (3x HBM traffic, CLAUDE.md).
- Forward tile: ``o = (x @ W8[l]) * s[l] + u_s @ B`` with ``u_s = (x@A)*ls``
  a tiny (m, r) precomputed outside; the f32 accumulator takes the delta
  before the single bf16 cast (strictly tighter than the unfused
  bf16(base)+bf16(delta) add).
- Backward tile (custom VJP — pallas has no autodiff):
  ``dx = g @ (W8[l]*s[l])^T + v_s @ A^T`` with ``v_s = (g@B^T)*ls`` — the
  transpose kernel folds the column scale into the bf16 dequant (same
  trade as the int4 T kernels) and accumulates the adapter term in its
  epilogue, so the backward's full-width adapter add never hits HBM either.
  ``dA = x^T @ (g@B^T) * ls`` and ``dB = (x@A)^T @ g * ls`` are thin XLA
  dots (their outputs ARE the gradients; nothing to fuse away).
- The frozen quantized leaves get zero/float0 cotangents; ``ls``
  (alpha/r) gets a zero cotangent — it is optimizer-masked by construction
  (models/lora.init_lora), so the true d/d_ls is never consumed.

Reference parity: the reference trains LoRA with torch/peft over dense bf16
weights (handsonvlm/train/train.py:216-231); a quantized frozen base with a
fused epilogue has no reference counterpart — this is the TPU-native design
for the same `--lora_enable` feature at single-chip memory budgets.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from handsonvlm_tpu.ops.int8_matmul import (
    PREFILL4_BLOCK_M,
    _cdiv,
    _interpret,
    _pick_div,
    _zero_ct,
)

# Scoped-VMEM ceiling (see int8_matmul._PREFILL4_VMEM_BUDGET for provenance)
_VMEM_BUDGET = int(_os.environ.get("HANDSONVLM_INT8_PREFILL_VMEM", str(15_900_000)))


# ---------------------------------------------------------------------------
# Block picking
# ---------------------------------------------------------------------------


def _fwd_vmem_est(bm: int, bn: int, bk: int, r: int) -> int:
    """Double-buffered x/w/s tiles + bf16 dequant temp + f32 acc scratch +
    double-buffered f32 out block (+ the tiny LoRA tiles when fused)."""
    x_db = 2 * bm * bk * 2
    w_db = 2 * bk * bn  # int8
    dequant = bk * bn * 2
    acc_and_out = bm * bn * 4 + 2 * bm * bn * 2  # f32 acc + bf16 out
    lora = (2 * bm * r * 4 + 2 * r * bn * 4) if r else 0
    return x_db + w_db + dequant + acc_and_out + lora


def _fwd_blocks(m: int, d: int, n: int, r: int):
    # balanced m split (int8_matmul._prefill4_blocks): never over-allocate
    # rows for small m, keep 8-row granularity
    nb_m = -(-max(m, 8) // PREFILL4_BLOCK_M)
    block_m = min(PREFILL4_BLOCK_M, -(-(-(-max(m, 8) // nb_m)) // 8) * 8)
    block_n = _pick_div(n, (256, 512, 128), n)
    block_k = _pick_div(d, (4096, 2048, 1024, 512, 256, 128), d)
    while _fwd_vmem_est(block_m, block_n, block_k, r) > _VMEM_BUDGET:
        if block_k > 128 and block_k % 2 == 0 and d % (block_k // 2) == 0:
            block_k //= 2
        elif block_m > 64:
            block_m = -(-(block_m // 2) // 8) * 8
        else:
            break
    return block_m, block_n, block_k


def _bwd_blocks(m: int, d: int, n: int, r: int):
    block_m = min(256, -(-max(m, 8) // 8) * 8)
    block_d = _pick_div(d, (512, 256, 128), d)
    block_n = _pick_div(n, (512, 256, 128), n)
    # g arrives bf16 (the incoming cotangent IS bf16 in training; one
    # cheap cast outside beats f32 tiles at 2x the DMA)
    def est():
        g_db = 2 * block_m * block_n * 2
        w_db = 2 * block_d * block_n
        dequant = block_d * block_n * 2
        acc_and_out = block_m * block_d * 4 + 2 * block_m * block_d * 2
        lora = (2 * block_m * r * 4 + 2 * block_d * r * 4) if r else 0
        return g_db + w_db + dequant + acc_and_out + lora

    while est() > _VMEM_BUDGET and block_m > 64:
        block_m = -(-(block_m // 2) // 8) * 8
    return block_m, block_d, block_n


def _pad_rank(u, bmat, a=None):
    """Pad the LoRA rank to a 128 multiple (lane-dim tiling); zero rows/cols
    do not change the products."""
    r = bmat.shape[0]
    rp = _cdiv(r, 128) * 128
    if rp == r:
        return u, bmat, a
    u = jnp.pad(u, [(0, 0), (0, rp - r)])
    bmat = jnp.pad(bmat, [(0, rp - r), (0, 0)])
    if a is not None:
        a = jnp.pad(a, [(0, 0), (0, rp - r)])
    return u, bmat, a


# ---------------------------------------------------------------------------
# Forward kernels: o = (x @ W8[l]) * s[l] (+ u_s @ B)
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)  # (bk, bn)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _done():
        # exact f32 post-scale (per output column) — cheaper and tighter
        # than folding s into the bf16 dequant (the (bm,bn) multiply runs
        # once vs (bk,bn) per accumulation step); the bf16 cast happens
        # HERE so the full-width f32 tile never round-trips HBM
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _fwd_lora_kernel(x_ref, w_ref, s_ref, u_ref, b_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _done():
        # LoRA epilogue: the (bm, r) @ (r, bn) delta lands in the f32 tile —
        # never materialised in HBM. f32 dot: the adapter path is f32 by
        # default (models/lora.lora_delta) and the FLOPs are ~r/d of the base.
        delta = jax.lax.dot_general(
            u_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32) + delta
                    ).astype(o_ref.dtype)


def _fwd_call(x2, w8_all, s_all, layer_idx, u_s=None, bmat=None):
    m, d = x2.shape
    L, _, n = w8_all.shape
    r = 0 if u_s is None else u_s.shape[1]
    block_m, block_n, block_k = _fwd_blocks(m, d, n, r)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
        if u_s is not None:
            u_s = jnp.pad(u_s, [(0, m_pad - m), (0, 0)])

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, ki, l: (i, ki)),
        pl.BlockSpec((1, block_k, block_n), lambda i, j, ki, l: (l[0], ki, j)),
        # dummy middle axis: Mosaic's last-two-dims tiling rule rejects a
        # (1, block_n) block on an (L, n) array (leading block 1 vs L);
        # (L, 1, n) makes the checked dims (1, block_n) vs (1, n) — legal
        pl.BlockSpec((1, 1, block_n), lambda i, j, ki, l: (l[0], 0, j)),
    ]
    ops = [x2, w8_all, s_all.reshape(L, 1, n)]
    kern = _fwd_kernel
    if u_s is not None:
        in_specs += [
            pl.BlockSpec((block_m, r), lambda i, j, ki, l: (i, 0)),
            pl.BlockSpec((r, block_n), lambda i, j, ki, l: (0, j)),
        ]
        ops += [u_s, bmat]
        kern = _fwd_lora_kernel

    def kernel(l_ref, *refs):  # scalar-prefetch ref arrives first
        kern(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n // block_n, d // block_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, ki, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *ops)
    return out[:m]


# ---------------------------------------------------------------------------
# Backward kernels: dx = g @ (W8[l] * s[l])^T (+ v_s @ A^T)
# ---------------------------------------------------------------------------


def _bwd_kernel(g_ref, w_ref, s_ref, o_ref, acc_ref):
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # n is the contraction dim here, so the column scale must fold into the
    # bf16 dequant (the int4 T kernels make the same precision trade)
    w = w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _bwd_lora_kernel(g_ref, w_ref, s_ref, v_ref, a_ref, o_ref, acc_ref):
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == pl.num_programs(2) - 1)
    def _done():
        # backward adapter epilogue: dx_tile += v_s @ A^T (both r-minor)
        delta = jax.lax.dot_general(
            v_ref[:], a_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (acc_ref[:] + delta).astype(o_ref.dtype)


def _bwd_call(g2, w8_all, s_all, layer_idx, v_s=None, a=None):
    m, n = g2.shape
    L, d, _ = w8_all.shape
    r = 0 if v_s is None else v_s.shape[1]
    block_m, block_d, block_n = _bwd_blocks(m, d, n, r)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        g2 = jnp.pad(g2, [(0, m_pad - m), (0, 0)])
        if v_s is not None:
            v_s = jnp.pad(v_s, [(0, m_pad - m), (0, 0)])

    in_specs = [
        pl.BlockSpec((block_m, block_n), lambda i, di, ni, l: (i, ni)),
        pl.BlockSpec((1, block_d, block_n), lambda i, di, ni, l: (l[0], di, ni)),
        # (L, 1, n) dummy middle axis — see _fwd_call
        pl.BlockSpec((1, 1, block_n), lambda i, di, ni, l: (l[0], 0, ni)),
    ]
    ops = [g2, w8_all, s_all.reshape(L, 1, w8_all.shape[2])]
    kern = _bwd_kernel
    if v_s is not None:
        in_specs += [
            pl.BlockSpec((block_m, r), lambda i, di, ni, l: (i, 0)),
            pl.BlockSpec((block_d, r), lambda i, di, ni, l: (di, 0)),
        ]
        ops += [v_s, a]
        kern = _bwd_lora_kernel

    def kernel(l_ref, *refs):
        kern(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, d // block_d, n // block_n),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_d),
                                   lambda i, di, ni, l: (i, di)),
            scratch_shapes=[pltpu.VMEM((block_m, block_d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.bfloat16),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *ops)
    return out[:m]


# ---------------------------------------------------------------------------
# Differentiable fronts
# ---------------------------------------------------------------------------


@jax.custom_vjp
def int8_matmul_stacked(x, w8_all, s_all, layer_idx):
    """x (..., d) @ dequant(w8_all (L, d, n)[layer_idx]) with the stacked
    buffer a scan constant (scalar-prefetch layer select). Frozen base:
    d/dx only; quantized leaves get zero/float0 cotangents."""
    return _int8_stacked_impl(x, w8_all, s_all, layer_idx)


def _int8_stacked_impl(x, w8_all, s_all, layer_idx):
    shape = x.shape
    d, n = w8_all.shape[1], w8_all.shape[2]
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    out = _fwd_call(x2, w8_all, s_all, layer_idx)
    return out.reshape(shape[:-1] + (n,)).astype(x.dtype)


def _int8_stacked_fwd(x, w8_all, s_all, layer_idx):
    out = _int8_stacked_impl(x, w8_all, s_all, layer_idx)
    return out, (w8_all, s_all, layer_idx, jnp.zeros((0,), x.dtype))


def _int8_stacked_bwd(res, dy):
    w8_all, s_all, layer_idx, xdt = res
    g2 = dy.reshape(-1, dy.shape[-1]).astype(jnp.bfloat16)
    dx = _bwd_call(g2, w8_all, s_all, layer_idx)
    dx = dx.reshape(dy.shape[:-1] + (w8_all.shape[1],)).astype(xdt.dtype)
    return dx, _zero_ct(w8_all), _zero_ct(s_all), _zero_ct(layer_idx)


int8_matmul_stacked.defvjp(_int8_stacked_fwd, _int8_stacked_bwd)


@jax.custom_vjp
def int8_lora_matmul_stacked(x, w8_all, s_all, a, bmat, ls, layer_idx):
    """Fused QLoRA projection: ``x @ dequant(W8[l]) + ls * (x@a) @ bmat``
    with the low-rank delta accumulated in the pallas output tile (never in
    HBM). a (d, r) / bmat (r, n) are THIS layer's adapter slices (scan xs —
    their cotangents stack naturally across the scan); ls = alpha/r.

    ls receives a ZERO cotangent: it is excluded from optimizer updates by
    construction (models/lora.init_lora), so its true gradient is never
    consumed — documented, not an oversight."""
    out, _ = _int8_lora_fwd_impl(x, w8_all, s_all, a, bmat, ls, layer_idx)
    return out


def _int8_lora_fwd_impl(x, w8_all, s_all, a, bmat, ls, layer_idx):
    shape = x.shape
    d, n = w8_all.shape[1], w8_all.shape[2]
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    # tiny first-stage dot stays outside (m x d x r); bf16 operands with an
    # f32 accumulator — a f32 `a` operand would promote x2 and materialise
    # a full-width f32 copy of x
    u = jnp.dot(x2, a.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    u_s, bp, _ = _pad_rank((u * ls).astype(jnp.float32),
                           bmat.astype(jnp.float32))
    out = _fwd_call(x2, w8_all, s_all, layer_idx, u_s, bp)
    return out.reshape(shape[:-1] + (n,)).astype(x.dtype), u


def _int8_lora_fwd(x, w8_all, s_all, a, bmat, ls, layer_idx):
    out, u = _int8_lora_fwd_impl(x, w8_all, s_all, a, bmat, ls, layer_idx)
    return out, (x, w8_all, s_all, a, bmat, ls, layer_idx, u)


def _int8_lora_bwd(res, dy):
    x, w8_all, s_all, a, bmat, ls, layer_idx, u = res
    d, n = w8_all.shape[1], w8_all.shape[2]
    g2 = dy.reshape(-1, n).astype(jnp.bfloat16)
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    # v = g @ B^T: thin (m, r); its scaled form rides the T-kernel epilogue.
    # bf16 operands throughout — any f32 operand promotes the full-width g
    v = jnp.dot(g2, bmat.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    v_s, _, ap = _pad_rank((v * ls).astype(jnp.float32),
                           jnp.zeros((bmat.shape[0], 1), jnp.float32),
                           a.astype(jnp.float32))
    dx = _bwd_call(g2, w8_all, s_all, layer_idx, v_s, ap)
    dx = dx.reshape(x.shape).astype(x.dtype)
    # adapter gradients: thin XLA dots (their outputs ARE the grads)
    da = (jnp.dot(x2.T, v.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) * ls).astype(a.dtype)
    db = (jnp.dot(u.astype(jnp.bfloat16).T, g2,
                  preferred_element_type=jnp.float32) * ls).astype(bmat.dtype)
    dls = jnp.zeros_like(ls)  # optimizer-masked; see docstring
    return (dx, _zero_ct(w8_all), _zero_ct(s_all), da, db, dls,
            _zero_ct(layer_idx))


int8_lora_matmul_stacked.defvjp(_int8_lora_fwd, _int8_lora_bwd)


# ---------------------------------------------------------------------------
# Param-tree restructure
# ---------------------------------------------------------------------------


def stack_llama_int8(llama_params: dict) -> dict:
    """Move the int8 projection leaves under layers['int8'] so apply_llama
    keeps them OUT of the scan xs (scan constants + scalar-prefetch layer
    select — the fused pallas path). Input: a quantize_llama/init_llama_int8
    tree ({"w8" (L, din, dout), "scale" (L, dout)} per projection)."""
    layers = llama_params["layers"]
    proj = {}
    for grp in ("attn", "mlp"):
        for name, leaf in layers[grp].items():
            if not (isinstance(leaf, dict) and "w8" in leaf):
                raise ValueError(f"{grp}/{name} is not an int8 leaf")
            proj[name] = leaf
    out = dict(llama_params)
    out["layers"] = {
        "int8": proj,
        "attn_norm": layers["attn_norm"],
        "mlp_norm": layers["mlp_norm"],
    }
    return out


def np_zero_like(x):  # re-export convenience for tests
    return np.zeros(jnp.shape(x), jax.dtypes.float0)
