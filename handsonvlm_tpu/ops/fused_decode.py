"""Fused decode-step MLP kernel — EXPERIMENTAL, measured SLOWER than the
unfused path; NOT wired into production (docs/PERF_NOTES.md "Fused
MLP-half megakernel").

Hypothesis (round-2 "Tiled int4 weight layout" note): the 7B int4 decode
GEMV chain sits ~2x above its raw-DMA bound because of per-pallas-call
overhead + pipeline fill (4 projection calls/layer x 32 layers), so
collapsing a layer's MLP half (rms_norm -> gate/up GEMV -> silu*up ->
down GEMV -> residual) into ONE sequential-grid pallas call should
approach the stream floor.

REFUTED on-chip (tools/perf_fused_mlp.py, 32-layer MLP chain at 7B
shapes, B=1, interleaved A/B, best-of-4): fused 9.25 ms/step vs unfused
4.18 ms/step (v1 biased-nibble variant: 5.73 vs 4.25). A single
sequential grid serializes the three weight streams phase-by-phase and
stalls the DMA engine at phase boundaries, which costs more than the
per-call overhead it saves; separate pallas_calls let Mosaic overlap one
projection's epilogue with the next one's weight prefetch. Kept for the
record + interpret-mode parity coverage; `fused_mlp_ok` gates it off.

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


def _dequant_tile(w_ref, s_ref):
    """Dequantize one packed int4 tile to bf16 in VMEM (scales folded in).

    w (1,1,G,HALF,BN) packed int8, s (1,1,G,1,BN) f32 -> (G*GROUP, BN)
    bf16, row order matching x (quantize_int4 pairs row r with r+HALF
    inside each group; concat on the half axis then a major-dim collapse
    restores contraction order — same body as int8_matmul._prefill4_kernel,
    which Mosaic compiles at 7B in production)."""
    pw = w_ref[0, 0].astype(jnp.int32)  # (G, HALF, BN)
    sc = s_ref[0, 0].astype(jnp.bfloat16)  # (G, 1, BN)
    lo = ((pw & 0x0F) - 8).astype(jnp.bfloat16) * sc
    hi = (pw >> 4).astype(jnp.bfloat16) * sc
    g, half, bn = lo.shape
    return jnp.concatenate([lo, hi], axis=1).reshape(g * GROUP, bn)


# ---------------------------------------------------------------------------
# Fused MLP half: rms_norm -> silu(x@Wg) * (x@Wu) -> @Wd -> + residual
# ---------------------------------------------------------------------------


def _fused_mlp_kernel(
    l_ref,  # scalar prefetch (1,) int32 layer index
    h_ref,  # (B, d) hidden (full block, constant)
    nrm_ref,  # (1, 1, d) mlp_norm scale for the layer
    wg_ref, sg_ref,  # (1,1,Gd,HALF,BNf) int8 / (1,1,Gd,1,BNf) f32
    wu_ref, su_ref,
    wd_ref, sd_ref,  # (1,1,Gf,HALF,BNd) / (1,1,Gf,1,BNd)
    hres_ref,  # (B, BNd) residual block (same hidden array, re-blocked)
    out_ref,  # (ROWS, BNd)
    xn_s,  # (ROWS, d) bf16 — normed activations
    act_s,  # (NBf, ROWS, BNf) bf16 — silu(gate)*up blocks
    *,
    nbf: int,
    nbd: int,
    eps: float,
):
    p = pl.program_id(0)
    b, d = h_ref.shape

    @pl.when(p == 0)
    def _norm():
        xn_s[...] = jnp.zeros_like(xn_s)
        h = h_ref[...].astype(jnp.float32)
        ms = jnp.mean(h * h, axis=-1, keepdims=True)
        xn = h * jax.lax.rsqrt(ms + eps) * nrm_ref[0].astype(jnp.float32)
        xn_s[:b] = xn.astype(jnp.bfloat16)

    @pl.when(p < nbf)
    def _gate_up():
        x = xn_s[...]
        yg = jax.lax.dot_general(
            x, _dequant_tile(wg_ref, sg_ref), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        yu = jax.lax.dot_general(
            x, _dequant_tile(wu_ref, su_ref), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        act = jax.nn.silu(yg) * yu  # (ROWS, BNf)
        act_s[pl.dslice(p, 1)] = act.astype(jnp.bfloat16)[None]

    @pl.when(p >= nbf)
    def _down():
        wdq = _dequant_tile(wd_ref, sd_ref)  # (f, BNd)
        bnd = wdq.shape[-1]
        wdb = wdq.reshape(nbf, -1, bnd)  # (NBf, BNf, BNd) major-dim split
        y = jax.lax.dot_general(
            act_s[...], wdb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (NBf, ROWS, BNd)
        y = jnp.sum(y, axis=0)
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
                pl.BlockSpec((1, 1, d), lambda p, l: (l[0], 0, 0)),
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
                pltpu.VMEM((ROWS, d), jnp.bfloat16),
                pltpu.VMEM((nbf, ROWS, bnf), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, nbd * bnd), hidden.dtype),
        interpret=_interpret(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        hidden, nrm_scales[:, None, :], wg["w4t"], sg, wu["w4t"], su,
        wd["w4t"], sd, hidden,
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
    directly via split_wgu_tiled applied to the int4 tree (adds wg/wu leaves fused_mlp_ok requires) instead)."""
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
    on trees carrying the separate gate/up tiling.

    Permanently False unless HANDSONVLM_FUSED_MLP=1: the kernel measured
    2.2x SLOWER than the unfused path on-chip (see module docstring)."""
    if _os.environ.get("HANDSONVLM_FUSED_MLP") != "1":
        return False
    if t != 1 or b > ROWS:
        return False
    if not {"wg", "wu", "w_down"} <= set(int4_stacked):
        return False
    wg = int4_stacked["wg"]["w4t"]
    return (
        wg.ndim == 5 and wg.shape[3] == HALF and wg.shape[2] == d // GROUP
        and wg.shape[4] % GROUP == 0
    )
