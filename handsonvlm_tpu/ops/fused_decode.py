"""Fused decode-step kernels: one pallas call per decoder-layer half.

Why (docs/PERF_NOTES.md "Tiled int4 weight layout"): the 7B int4 decode
GEMV chain runs at 8.3 ms/step against a 4.5 ms raw-DMA bound, and the
gap is NOT layout contiguity — it is per-pallas-call overhead + pipeline
fill (4 projection calls + 1 attention call per layer x 32 layers = 160
calls/step at ~12 us + a pipeline fill each). These kernels collapse a
layer's MLP half (rms_norm -> gate/up GEMV -> silu*up -> down GEMV ->
residual) into ONE pallas call, and the attention half (rms_norm -> qkv
GEMV -> RoPE -> cached attention -> out GEMV -> residual) into another:
2 calls/layer instead of 5.

Mechanics: a 1-D sequential grid (TPU pallas grid steps run in order on
the core) walks weight tiles phase by phase; operands that are inactive
in a phase keep a constant block index (Mosaic only issues a DMA when the
index changes), and VMEM scratch carries the intermediates (normed
activations in biased-nibble halves form, gate*up activations, attention
accumulators) across phases. Weights use the tiled int4 layout of
ops.int8_matmul (same biased-nibble algebra as _gemv4_kernel — outputs
match the unfused path bit-for-bit in f32 accumulation order per block).

Mosaic constraints designed around (CLAUDE.md legalization gaps): no
minor-dim reshapes (halves are built with static 64-lane slices per
group — head_dim 128 == the int4 group size, so attention outputs split
on head boundaries), no i8 shifts (nibbles extract via i32 >> 4), dot
batch dims only (per-group batched dots, batch=G).

Reference parity: this replaces the compute schedule only; the math is
LLaMA decode (llava/train/llama_flash_attn_monkey_patch.py is the
reference's fused-attention analogue; there is no reference analogue for
a fused layer step — CUDA/torch cannot express it without a custom
megakernel).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # int4 contraction-group size == llama head_dim
HALF = GROUP // 2
ROWS = 8  # sublane padding for the GEMV dots (MXU needs >= 8 rows)


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _gemv_tile(xlo_ref, xc_ref, sxT_ref, w_ref, s_ref):
    """Biased-nibble GEMV on one weight tile (see int8_matmul.quantize_int4).

    xlo/xc (G, R, HALF) bf16, sxT (G, R) f32 scratch refs;
    w (1,1,G,HALF,BN) packed int8, s (1,1,G,1,BN) f32 operand refs.
    Returns (R, BN) f32. The -8*sum(xlo) correction folds into the
    per-group scale-sum as a broadcast add (no separate correction dot)."""
    byte = w_ref[0, 0].astype(jnp.bfloat16)  # (G, HALF, BN)
    hi = (w_ref[0, 0].astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))  # batch G, contract HALF
    a = jax.lax.dot_general(
        xlo_ref[...], byte, dn, preferred_element_type=jnp.float32)
    a = a + jax.lax.dot_general(
        xc_ref[...], hi, dn, preferred_element_type=jnp.float32)
    s = s_ref[0, 0, :, 0, :]  # (G, BN)
    return jnp.sum((a + sxT_ref[...][:, :, None]) * s[:, None, :], axis=0)


def _store_halves(vec, base, xlo_ref, xc_ref, sxT_ref, b):
    """Split a (b, W) f32 vector into per-group biased-nibble halves and
    store at group rows [base, base + W/GROUP). `base` may be traced
    (dynamic major-dim stores); the 64-lane splits are static slices."""
    w = vec.shape[-1]
    for t in range(w // GROUP):
        lo = vec[:, GROUP * t: GROUP * t + HALF]
        hic = vec[:, GROUP * t + HALF: GROUP * (t + 1)]
        idx = base + t
        pl.store(xlo_ref, (pl.dslice(idx, 1), pl.dslice(0, b), slice(None)),
                 lo.astype(jnp.bfloat16)[None])
        pl.store(xc_ref, (pl.dslice(idx, 1), pl.dslice(0, b), slice(None)),
                 (hic - 16.0 * lo).astype(jnp.bfloat16)[None])
        pl.store(sxT_ref, (pl.dslice(idx, 1), pl.dslice(0, b)),
                 (-8.0 * jnp.sum(lo, axis=-1))[None])


# ---------------------------------------------------------------------------
# Fused MLP half: rms_norm -> silu(x@Wg) * (x@Wu) -> @Wd -> + residual
# ---------------------------------------------------------------------------


def _fused_mlp_kernel(
    l_ref,  # scalar prefetch (1,) int32 layer index
    h_ref,  # (B, d) hidden (full block, constant)
    nrm_ref,  # (1, d) mlp_norm scale for the layer
    wg_ref, sg_ref,  # (1,1,Gd,HALF,BNf) int8 / (1,1,Gd,1,BNf) f32
    wu_ref, su_ref,
    wd_ref, sd_ref,  # (1,1,Gf,HALF,BNd) / (1,1,Gf,1,BNd)
    hres_ref,  # (B, BNd) residual block (same hidden array, re-blocked)
    out_ref,  # (ROWS, BNd)
    xlo1, xc1, sx1,  # (Gd, ROWS, HALF) bf16 x2, (Gd, ROWS) f32
    xlo2, xc2, sx2,  # (Gf, ROWS, HALF) bf16 x2, (Gf, ROWS) f32
    *,
    nbf: int,
    nbd: int,
    eps: float,
):
    p = pl.program_id(0)
    b, d = h_ref.shape

    @pl.when(p == 0)
    def _norm():
        xlo1[...] = jnp.zeros_like(xlo1)
        xc1[...] = jnp.zeros_like(xc1)
        sx1[...] = jnp.zeros_like(sx1)
        xlo2[...] = jnp.zeros_like(xlo2)
        xc2[...] = jnp.zeros_like(xc2)
        sx2[...] = jnp.zeros_like(sx2)
        h = h_ref[...].astype(jnp.float32)
        ms = jnp.mean(h * h, axis=-1, keepdims=True)
        xn = h * jax.lax.rsqrt(ms + eps) * nrm_ref[...].astype(jnp.float32)
        for g in range(d // GROUP):  # static unroll: no minor-dim reshapes
            lo = xn[:, GROUP * g: GROUP * g + HALF]
            hic = xn[:, GROUP * g + HALF: GROUP * (g + 1)]
            xlo1[g, :b] = lo.astype(jnp.bfloat16)
            xc1[g, :b] = (hic - 16.0 * lo).astype(jnp.bfloat16)
            sx1[g, :b] = -8.0 * jnp.sum(lo, axis=-1)

    @pl.when(p < nbf)
    def _gate_up():
        yg = _gemv_tile(xlo1, xc1, sx1, wg_ref, sg_ref)  # (ROWS, BNf)
        yu = _gemv_tile(xlo1, xc1, sx1, wu_ref, su_ref)
        act = jax.nn.silu(yg) * yu
        bnf = act.shape[-1]
        _store_halves(act[:b], p * (bnf // GROUP), xlo2, xc2, sx2, b)

    @pl.when(p >= nbf)
    def _down():
        y = _gemv_tile(xlo2, xc2, sx2, wd_ref, sd_ref)  # (ROWS, BNd)
        out_ref[:b] = (
            y[:b] + hres_ref[...].astype(jnp.float32)
        ).astype(out_ref.dtype)


def fused_mlp_stacked(
    hidden: jnp.ndarray,  # (B, d)
    nrm_scales: jnp.ndarray,  # (L, d)
    wg: dict, wu: dict, wd: dict,  # tiled int4 leaves {"w4t","gst"}
    layer_idx,
    eps: float = 1e-6,
):
    """One-pallas-call MLP half of a decoder layer (decode-sized inputs)."""
    b, d = hidden.shape
    L, nbf, gd, half, bnf = wg["w4t"].shape
    _, nbd, gf, _, bnd = wd["w4t"].shape
    assert half == HALF and gd == d // GROUP, (wg["w4t"].shape, d)
    assert bnf % GROUP == 0, bnf
    sg = wg["gst"][:, :, :, None, :]  # bitcast-reshape: singleton keeps the
    su = wu["gst"][:, :, :, None, :]  # constrained block dims at (1, BN)
    sd = wd["gst"][:, :, :, None, :]

    kernel = functools.partial(
        _fused_mlp_kernel, nbf=nbf, nbd=nbd, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbf + nbd,),
            in_specs=[
                pl.BlockSpec((b, d), lambda p, l: (0, 0)),
                pl.BlockSpec((1, d), lambda p, l: (l[0], 0)),
                pl.BlockSpec((1, 1, gd, half, bnf),
                             lambda p, l: (l[0], jnp.minimum(p, nbf - 1), 0, 0, 0)),
                pl.BlockSpec((1, 1, gd, 1, bnf),
                             lambda p, l: (l[0], jnp.minimum(p, nbf - 1), 0, 0, 0)),
                pl.BlockSpec((1, 1, gd, half, bnf),
                             lambda p, l: (l[0], jnp.minimum(p, nbf - 1), 0, 0, 0)),
                pl.BlockSpec((1, 1, gd, 1, bnf),
                             lambda p, l: (l[0], jnp.minimum(p, nbf - 1), 0, 0, 0)),
                pl.BlockSpec((1, 1, gf, half, bnd),
                             lambda p, l: (l[0], jnp.clip(p - nbf, 0, nbd - 1), 0, 0, 0)),
                pl.BlockSpec((1, 1, gf, 1, bnd),
                             lambda p, l: (l[0], jnp.clip(p - nbf, 0, nbd - 1), 0, 0, 0)),
                pl.BlockSpec((b, bnd),
                             lambda p, l: (0, jnp.clip(p - nbf, 0, nbd - 1))),
            ],
            out_specs=pl.BlockSpec(
                (ROWS, bnd), lambda p, l: (0, jnp.clip(p - nbf, 0, nbd - 1))),
            scratch_shapes=[
                pltpu.VMEM((gd, ROWS, HALF), jnp.bfloat16),
                pltpu.VMEM((gd, ROWS, HALF), jnp.bfloat16),
                pltpu.VMEM((gd, ROWS), jnp.float32),
                pltpu.VMEM((gf, ROWS, HALF), jnp.bfloat16),
                pltpu.VMEM((gf, ROWS, HALF), jnp.bfloat16),
                pltpu.VMEM((gf, ROWS), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, nbd * bnd), hidden.dtype),
        interpret=_interpret(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        hidden, nrm_scales, wg["w4t"], sg, wu["w4t"], su, wd["w4t"], sd,
        hidden,
    )
    return out[:b]


# ---------------------------------------------------------------------------
# Weight-layout helpers
# ---------------------------------------------------------------------------


def split_wgu_tiled(wgu: dict, f: int) -> tuple:
    """Fused tiled 'wgu' leaf -> separate tiled wg / wu leaves with tile
    width BN=256 (f is not divisible by 512 at 7B/13B, and the fused
    kernel must pair gate block j with up block j).

    Host/convert-time helper — materializes flat transients; do NOT call
    on-device at 7B (freed device memory is lost on this backend; init
    directly via init_llama_int4(fused_mlp=True) instead)."""
    from handsonvlm_tpu.ops.int8_matmul import tile_int4_stacked

    w4t, gst = wgu["w4t"], wgu["gst"]
    L, nb, g, half, bn = w4t.shape
    n = nb * bn
    flat_w = jnp.transpose(w4t, (0, 2, 3, 1, 4)).reshape(L, g, half, n)
    flat_s = jnp.transpose(gst, (0, 2, 1, 3)).reshape(L, g, n)
    bnf = 256 if f % 256 == 0 else int(np.gcd(f, 256))
    out = []
    for sl in (slice(0, f), slice(f, 2 * f)):
        out.append(tile_int4_stacked(
            flat_w[..., sl], flat_s[..., sl], block_n=bnf))
    return out[0], out[1]


def fused_mlp_ok(int4_stacked: dict, d: int, t: int, b: int) -> bool:
    """Trace-time check: the fused MLP kernel serves decode-shaped inputs
    on trees carrying the separate gate/up tiling."""
    if t != 1 or b > ROWS or _interpret() and False:
        return False
    if not {"wg", "wu", "w_down"} <= set(int4_stacked):
        return False
    wg = int4_stacked["wg"]["w4t"]
    return (
        wg.ndim == 5 and wg.shape[3] == HALF and wg.shape[2] == d // GROUP
        and wg.shape[4] % GROUP == 0
    )
