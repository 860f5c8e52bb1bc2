"""Int8 weight-only matmul (decoder projections, per-output-channel scales).

Two implementations, chosen by INT8_IMPL:

- ``xla`` (default): `dot_general(x, w8.astype(bf16))` — current XLA fuses
  the upcast into the matmul and streams int8 from HBM (measured 11.1
  ms/step for the full 7B GEMV chain vs the 10 ms int8 streaming floor;
  tools/perf_int8_paths.py). An earlier probe that showed ~1.0x predates
  this finding — XLA does NOT materialize a bf16 copy.
- ``pallas``: blockwise VMEM-dequant kernel. Kept for comparison/tests;
  measured 18.8 ms/step in the same chain (per-call overhead + worse
  stream/compute overlap than XLA's fused path).

Accuracy: ~1e-2 relative per projection (opt-in mode; the bf16 path stays
the default for metric-parity work).
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512
BLOCK_M = 256  # row blocking for prefill-sized inputs


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def quantize_int8(w: jnp.ndarray, axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: w (d, n) -> (w8 (d, n), scale (n,))."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w8, scale.astype(jnp.float32)


def _gemv8_kernel(x_ref, w_ref, s_ref, o_ref):
    # x (block_m, d) bf16; w (d, block_n) int8; s (1, block_n) f32
    w = w_ref[:].astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = y * s_ref[:]


def _pick_blocks(m: int, d: int, n: int) -> Tuple[int, int]:
    """Block sizes keeping x + 2x double-buffered w + out under ~10MB VMEM."""
    budget = 10 * 1024 * 1024
    block_n = min(BLOCK_N, n)
    block_m = min(BLOCK_M, max(m, 8))
    while block_n > 128 and 2 * d * block_n > budget // 2:
        block_n //= 2
    while block_m > 8 and (block_m * d * 2 + 2 * d * block_n + block_m * block_n * 4) > budget:
        block_m //= 2
    return block_m, block_n


def int8_matmul(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x (M, d) @ dequant(w8 (d, n)) -> (M, n) float32."""
    m, d = x.shape
    n = w8.shape[1]
    block_m, block_n = _pick_blocks(m, d, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x = jnp.pad(x, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w8 = jnp.pad(w8, [(0, 0), (0, n_pad - n)])
        scale = jnp.pad(scale, [(0, n_pad - n)])

    out = pl.pallas_call(
        _gemv8_kernel,
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=_interpret(),
    )(x, w8, scale[None, :])
    return out[:m, :n]


LMHEAD_INT8 = _os.environ.get("HANDSONVLM_LMHEAD_INT8", "1") == "1"


def quantize_lm_head(params: dict) -> dict:
    """lm_head {"weight": (d, V)} -> {"w8": int8, "scale": (V,) f32}
    (per-vocab-column symmetric), consumed by models/llama.lm_logits via the
    fused-upcast XLA dot. Saves the 0.26 GB/step bf16 head read at 7B decode
    (~0.4 ms of a ~10 ms int4 step). No-op for tied embeddings, already-
    quantized heads, or HANDSONVLM_LMHEAD_INT8=0."""
    if not LMHEAD_INT8 or "lm_head" not in params or "weight" not in params["lm_head"]:
        return params
    w8, scale = quantize_int8(params["lm_head"]["weight"], axis=0)
    out = dict(params)
    out["lm_head"] = {"w8": w8, "scale": scale}
    return out


def quantize_stacked_int8(w: jnp.ndarray) -> dict:
    """(L, din, dout) -> {"w8" int8, "scale" (L, dout) f32}, one shot."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # (L, dout)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(wf / scale[:, None, :]), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": scale.astype(jnp.float32)}


def quantize_llama(llama_params: dict, donate: bool = False) -> dict:
    """bf16/f32 llama tree -> int8 weight-only tree (decoder projections).

    Each projection leaf becomes {"w8": (L, din, dout) int8,
    "scale": (L, dout) f32}; embed/norms/lm_head stay as-is. Roughly halves
    decode HBM traffic and model memory (7B: 13.5 GB -> ~7.5 GB; 13B fits a
    single 16 GB chip).

    `donate=True` (eager path, outside jit) quantizes one projection per
    jitted call and donates the bf16 stack, so peak memory is
    bf16_tree + one projection instead of bf16_tree + int8_tree — required
    at 13B on a 16 GB chip.
    """
    out = dict(llama_params)
    layers = dict(llama_params["layers"])
    quant = (
        jax.jit(quantize_stacked_int8, donate_argnums=(0,))
        if donate else quantize_stacked_int8
    )
    for grp in ("attn", "mlp"):
        layers[grp] = {k: quant(v) for k, v in llama_params["layers"][grp].items()}
    out["layers"] = {
        **layers,
        "attn_norm": llama_params["layers"]["attn_norm"],
        "mlp_norm": llama_params["layers"]["mlp_norm"],
    }
    return quantize_lm_head(out)


def _init_lm_head(key, d: int, vocab: int, dtype):
    """Random lm_head for the quantized-init paths: drawn DIRECTLY as int8
    when LMHEAD_INT8 (inside the init_small jit, so no bf16 transient ever
    reaches the Python level — see init_llama_int8's docstring)."""
    if LMHEAD_INT8:
        w8 = jax.random.randint(key, (d, vocab), -127, 128, jnp.int32).astype(jnp.int8)
        # dequantized std ~ 0.02 (uniform int8 std ~73.3)
        scale = jnp.full((vocab,), 0.02 / 73.3, jnp.float32)
        return {"w8": w8, "scale": scale}
    return {"weight": (jax.random.normal(key, (d, vocab)) * 0.02).astype(dtype)}


def init_llama_int8(rng: jax.Array, cfg, dtype=jnp.bfloat16) -> dict:
    """Random-init an int8-quantized llama with NO bf16 weight transients:
    int8 values are drawn directly per projection (random weights — the
    bench/smoke path; real weights quantize host-side in convert/).

    Why so careful: on the tunneled chip, large device buffers freed at the
    Python level are not reliably returned to the allocator (measured:
    freeing a 12.5 GiB tree leaves ~0 reusable headroom, docs/PERF_NOTES.md),
    so even transient bf16 stacks permanently poison the heap at 13B."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    h, k, hd, L = cfg.num_heads, cfg.kv_heads, cfg.head_dim_, cfg.num_layers
    shapes = {
        "attn": {"wq": (L, d, h * hd), "wk": (L, d, k * hd),
                 "wv": (L, d, k * hd), "wo": (L, h * hd, d)},
        "mlp": {"w_gate": (L, d, f), "w_up": (L, d, f), "w_down": (L, f, d)},
    }

    @functools.partial(jax.jit, static_argnames=("shape",))
    def init_quant(key, shape):
        # ~N(0, 0.02) after dequant: uniform int8 with a flat per-channel
        # scale sized so dequantized std matches the bf16 init
        w8 = jax.random.randint(key, shape, -127, 128, jnp.int32).astype(jnp.int8)
        scale = jnp.full((shape[0], shape[2]), 0.02 / (73.3 / 127.0) / 127.0, jnp.float32)
        return {"w8": w8, "scale": scale}

    # small pieces (embed/norms/lm_head) via a tiny-config trick: init the
    # full tree at L=0-size projections is awkward — just init them directly
    keys = jax.random.split(rng, 10)

    @jax.jit
    def init_small(key):
        ks = jax.random.split(key, 2)
        p = {
            "embed": {"weight": (jax.random.normal(ks[0], (cfg.padded_vocab_size, d)) * 0.02).astype(dtype)},
            "final_norm": {"scale": jnp.ones((d,), dtype)},
            "norms": {
                "attn_norm": {"scale": jnp.ones((L, d), dtype)},
                "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
            },
        }
        if not cfg.tie_word_embeddings:
            p["lm_head"] = _init_lm_head(ks[1], d, cfg.padded_vocab_size, dtype)
        return p

    small = init_small(keys[0])
    layers = {"attn": {}, "mlp": {},
              "attn_norm": small["norms"]["attn_norm"],
              "mlp_norm": small["norms"]["mlp_norm"]}
    i = 1
    for grp in ("attn", "mlp"):
        for name, shape in shapes[grp].items():
            layers[grp][name] = init_quant(keys[i], shape)
            jax.block_until_ready(layers[grp][name]["w8"])  # cap the transient
            i += 1
    params = {"embed": small["embed"], "layers": layers,
              "final_norm": small["final_norm"]}
    if "lm_head" in small:
        params["lm_head"] = small["lm_head"]
    return params


def init_llama_int4(rng: jax.Array, cfg, dtype=jnp.bfloat16, group: int = None) -> dict:
    """Random-init an int4-quantized llama in the FUSED stacked layout with
    NO bf16 weight transients (see init_llama_int8 for why that matters on
    this backend). Bench/smoke path; real weights quantize in convert/."""
    group = group or INT4_GROUP
    d, f = cfg.hidden_size, cfg.intermediate_size
    h, k, hd, L = cfg.num_heads, cfg.kv_heads, cfg.head_dim_, cfg.num_layers
    shapes = {
        "wqkv": (d, (h + 2 * k) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    keys = jax.random.split(rng, len(shapes) + 1)

    @functools.partial(jax.jit, static_argnames=("din", "dout"))
    def draw(key, din, dout):
        g = group if din % group == 0 else math.gcd(din, group)
        G = din // g
        bn = _pick_block_n(dout, G * (g // 2))
        nb = dout // bn
        # drawn DIRECTLY in the tiled layout (tile_int4_stacked) — no flat
        # transient (values are random either way)
        w4t = jax.random.randint(
            key, (L, nb, G, g // 2, bn), -128, 128, jnp.int32).astype(jnp.int8)
        # flat scale sized so dequantized std ~ 0.02 (uniform int4 std ~4.6)
        gst = jnp.full((L, nb, G, bn), 0.02 / 4.6, jnp.float32)
        return {"w4t": w4t, "gst": gst}

    int4 = {}
    for key, (name, (din, dout)) in zip(keys[1:], shapes.items()):
        int4[name] = draw(key, din, dout)
        jax.block_until_ready(int4[name]["w4t"])

    @jax.jit
    def init_small(key):
        ks = jax.random.split(key, 2)
        p = {
            "embed": {"weight": (jax.random.normal(ks[0], (cfg.padded_vocab_size, d)) * 0.02).astype(dtype)},
            "final_norm": {"scale": jnp.ones((d,), dtype)},
            "attn_norm": {"scale": jnp.ones((L, d), dtype)},
            "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
        }
        if not cfg.tie_word_embeddings:
            p["lm_head"] = _init_lm_head(ks[1], d, cfg.padded_vocab_size, dtype)
        return p

    small = init_small(keys[0])
    params = {
        "embed": small["embed"],
        "layers": {"int4": int4, "attn_norm": small["attn_norm"],
                   "mlp_norm": small["mlp_norm"]},
        "final_norm": small["final_norm"],
    }
    if "lm_head" in small:
        params["lm_head"] = small["lm_head"]
    return params


INT8_IMPL = "xla"  # "xla" | "pallas" — see module docstring for numbers

INT4_GROUP = 128  # contraction-group size for int4 scales
INT4_PREFILL_MIN_M = 128  # rows at which the dequant-MXU prefill kernel wins


def quantize_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> dict:
    """Group-wise symmetric int4: w (d, n) -> {"w4" (G, g/2, n) int8 with
    two nibbles per byte, "gscale" (G, n) f32}, d = G*g. Per-(group,
    out-channel) scales keep the 4-bit error local (bitsandbytes-nf4-style
    blocking, reference builder.py:22-31 4-bit load path).

    Packing: within each group, row r pairs with row r + g/2; the HIGH
    nibble holds the second half's value two's-complement, the LOW nibble
    holds the first half's value BIASED by +8, i.e.

        byte = ((lo + 8) & 0xF) | (hi << 4)  =  16*hi + (lo + 8)

    so the GEMV kernel needs only ONE nibble extraction: with
    xc = x_hi - 16*x_lo,   x_lo.lo + x_hi.hi = x_lo.byte + xc.hi - 8*sum(x_lo)
    — the low nibble never gets unpacked (it rides the byte dot), and the
    -8*sum(x_lo) excess is one small rank-G correction dot. Values are
    nibble-packed into int8 rather than stored as jnp.int4: sub-byte (S4)
    arrays crash this backend's jit argument transfer."""
    d, n = w.shape
    if d % group:
        group = math.gcd(d, group) or d  # small test dims
    if group % 2:
        group *= 2  # need an even group to split halves
    wf = w.astype(jnp.float32).reshape(d // group, group, n)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # (G, n)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -8, 7).astype(jnp.int8)
    half = group // 2
    lo, hi = q[:, :half, :], q[:, half:, :]  # first/second half share a byte
    packed = (((lo + 8) & 0x0F) | (hi << 4)).astype(jnp.int8)
    return {"w4": packed, "gscale": scale.astype(jnp.float32)}


def _unpack_int4(packed: jnp.ndarray, dtype) -> jnp.ndarray:
    """(G, g/2, n) nibble-packed int8 -> (G, g, n) values in `dtype`
    (half-split packing, +8-biased low nibble)."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 & 0x0F) - 8).astype(dtype)
    hi = (p32 >> 4).astype(dtype)  # arithmetic shift sign-extends
    return jnp.concatenate([lo, hi], axis=1)


def _split_x_halves(x2: jnp.ndarray, G: int, group: int):
    """x (m, d) f32 -> xlo/xc (G, m, g/2) bf16 + sx8 (m, G) f32 for the
    biased-nibble GEMV identity (see quantize_int4)."""
    m = x2.shape[0]
    half = group // 2
    xr = x2.reshape(m, G, group)
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).transpose(1, 0, 2).astype(jnp.bfloat16)
    sx8 = (-8.0 * jnp.sum(xlo, axis=2)).astype(jnp.float32)
    return xlo.transpose(1, 0, 2).astype(jnp.bfloat16), xc, sx8


def _gemv4_kernel(xlo_ref, xc_ref, sx8_ref, w_ref, s_ref, o_ref):
    # xlo/xc (G, bm, g/2) bf16; sx8 (bm, G) f32; w (G, g/2, bn) packed int8;
    # s (G, bn) f32. One nibble extraction (i32 >> 4: Mosaic cannot legalize
    # i8 shifts or bf16 floor); per-group batched dots so the TRUE
    # per-(group, n) scales land on the (G, bm, bn) dot outputs instead of
    # every weight element.
    byte = w_ref[...].reshape(w_ref.shape[-3:]).astype(jnp.bfloat16)
    hi = (w_ref[...].reshape(w_ref.shape[-3:]).astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))  # batch G, contract g/2
    a = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    a += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    s = s_ref[...].reshape(s_ref.shape[-2:])
    y = jnp.sum(a * s[:, None, :], axis=0)  # (bm, bn)
    y += jax.lax.dot_general(
        sx8_ref[:], s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = y


INT4_GEMV_BN = int(_os.environ.get("HANDSONVLM_INT4_GEMV_BN", str(BLOCK_N)))


def _pick_block_n(n: int, d_bytes: int) -> int:
    """Largest block_n <= INT4_GEMV_BN that divides n and keeps the packed
    block + f32 intermediates under VMEM budget."""
    block_n = min(INT4_GEMV_BN, n)
    while block_n > 8 and (n % block_n or 2 * d_bytes * block_n > 5 * 1024 * 1024):
        block_n //= 2
    return max(block_n, math.gcd(n, 128))


def _pick_blocks_int4(m: int, G: int, half: int, n: int):
    """Blocks for the batched-group GEMV: the (G, bm, bn) f32 dot
    intermediate dominates VMEM at prefill sizes — cap it at ~4 MB
    (bm=256 blew the 16 MB scoped-vmem limit at 7B prefill)."""
    block_n = _pick_block_n(n, G * half)
    block_m = min(BLOCK_M, max(m, 8))
    while block_m > 8 and G * block_m * block_n * 4 > 4 * 1024 * 1024:
        block_m //= 2
    return block_m, block_n


def int4_matmul(x: jnp.ndarray, w4: jnp.ndarray, gscale: jnp.ndarray) -> jnp.ndarray:
    """x (..., d) @ dequant(nibble-packed w4 (G, g/2, n)) -> (..., n).

    Pallas kernel: int4 weights stream to VMEM packed and dequantize
    on-chip. XLA formulations materialize the unpacked bf16 matrix in HBM
    (measured 113-188 ms/step for the 7B chain vs ~5 ms int4 floor).
    Standalone layer form; inside a layer scan use int4_matmul_stacked
    (scan-sliced pallas operands pay a full-weight copy per layer)."""
    shape = x.shape
    G, half, n = w4.shape
    d = G * half * 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks_int4(m, G, half, n)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xlo, xc, sx8 = _split_x_halves(x2, G, half * 2)

    out = pl.pallas_call(
        _gemv4_kernel,
        grid=(m_pad // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((G, block_m, half), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_m, half), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, G), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, half, block_n), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=_interpret(),
    )(xlo, xc, sx8, w4, gscale)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def tile_int4_stacked(w4_all: jnp.ndarray, gs_all: jnp.ndarray,
                      block_n: int = None) -> dict:
    """Re-layout stacked packed weights into contiguous per-block tiles:

      w4 (L, G, g/2, n) -> w4t (L, NB, G, g/2, BN),  gs -> gst (L, NB, G, BN)

    Why: the GEMV kernel's weight block [l, :, :, j*bn:(j+1)*bn] on the
    (L, G, g/2, n) layout is a strided DMA of G*g/2 rows x bn bytes (512 B
    rows at 7B) — measured ~410 GB/s effective vs 748 GB/s raw contiguous
    int8 DMA (tools/perf_pallas_dma.py). With the tile as the minor
    dimensions each grid step reads ONE contiguous G*g/2*BN-byte block
    (~1 MB at 7B), restoring full-rate streaming. BN is frozen at quantize
    time with the same rule the kernel uses (_pick_block_n)."""
    L, G, half, n = w4_all.shape
    bn = block_n or _pick_block_n(n, G * half)
    nb = n // bn
    assert nb * bn == n, (n, bn)
    w4t = jnp.transpose(w4_all.reshape(L, G, half, nb, bn), (0, 3, 1, 2, 4))
    gst = jnp.transpose(gs_all.reshape(L, G, nb, bn), (0, 2, 1, 3))
    return {"w4t": w4t, "gst": gst}


def _int4_gemv_tiled(x, w4t, gst, layer_idx):
    """Decode-sized x @ dequant(tiled w4t[layer_idx]) — one contiguous
    weight tile per grid step (see tile_int4_stacked)."""
    shape = x.shape
    L, NB, G, half, BN = w4t.shape
    d = G * half * 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, _ = _pick_blocks_int4(m, G, half, BN)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xlo, xc, sx8 = _split_x_halves(x2, G, half * 2)

    def kernel(l_ref, *refs):
        _gemv4_kernel(*refs)  # block shapes reshape via shape[-3:]/[-2:]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, NB),
            in_specs=[
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((block_m, G), lambda i, j, l: (i, 0)),
                pl.BlockSpec(
                    (1, 1, G, half, BN), lambda i, j, l: (l[0], j, 0, 0, 0)
                ),
                pl.BlockSpec((1, 1, G, BN), lambda i, j, l: (l[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, BN), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, NB * BN), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xlo, xc, sx8, w4t, gst)
    return out[:m].reshape(shape[:-1] + (NB * BN,)).astype(x.dtype)


def _prefill4_kernel(xr_ref, w_ref, s_ref, o_ref, acc_ref):
    # xr (bm, bk) bf16; w (1, GK, g/2, bn) packed int8; s (1, GK, 1, bn) f32
    # (4D so the block's constrained last-two dims are (1, bn), not (GK, bn)
    # — GK can be tiny for odd d like w_down's 11008).
    # Dequantize the weight block to bf16 IN VMEM, then one full-contraction
    # MXU dot — at prefill m the group-batched GEMV formulation (above)
    # serializes G small (bm x g/2) dots and wastes the systolic array.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[0].astype(jnp.int32)  # (GK, g/2, bn)
    s = s_ref[0].astype(jnp.bfloat16)  # (GK, 1, bn)
    lo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * s
    hi = (p >> 4).astype(jnp.bfloat16) * s
    # rows within a group are ordered [lo-half, hi-half] (quantize_int4), so
    # concatenating on the half axis then flattening the major dims matches
    # x's row order exactly
    gk, half, bn = lo.shape
    wdq = jnp.concatenate([lo, hi], axis=1).reshape(gk * 2 * half, bn)
    acc_ref[:] += jax.lax.dot_general(
        xr_ref[:], wdq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:]


# bm=512: each m-block pays the FULL VPU dequant of every weight tile it
# touches, so fewer/larger m-blocks win as long as VMEM holds (m=398:
# 48.1 -> 37.5 ms for the 7B projection chain; m=2048: 206 -> 182;
# tools/perf_int4_prefill_xla.py sweep 2026-08-17). The balanced split in
# _prefill4_blocks keeps the actual block near ceil(m/nb) so small m never
# over-allocates.
PREFILL4_BLOCK_M = int(_os.environ.get("HANDSONVLM_INT4_PREFILL_BM", "512"))
PREFILL4_BLOCK_N = int(_os.environ.get("HANDSONVLM_INT4_PREFILL_BN", "256"))
# bn default 256 (was 512): the 2026-08-18 on-chip sweep
# (tools/perf_int4_prefill_tune.py) measured (bm=512,bn=256,full-d bk)
# at 63.0 ms per T=512 7B forward vs 66.3 for the old effective default
# (512,512 sheds to bk=2048 under the VMEM budget) and 70.8 for
# (256,512) — the narrower n-tile keeps the full-d contraction inside
# scoped VMEM, and x re-DMA is free across n-steps (constant block index)
# tuned on-chip: (256,512) 65 ms vs (512,256) 74, (128,512) 87, (256,256)
# 107 per T=512 7B prefill (tools/perf_int4_prefill_tune.py); env knobs for
# debugging compiler limits at other model scales (13B backward probe)
INT4_T_BD = int(_os.environ.get("HANDSONVLM_INT4_T_BD", "512"))
INT4_T_BN = int(_os.environ.get("HANDSONVLM_INT4_T_BN", "512"))
# 0 = auto (full d when <=4096); the block_k sweep knob for the prefill MFU
# push (tools/perf_int4_prefill_tune.py --sweep-k)
PREFILL4_BLOCK_K = int(_os.environ.get("HANDSONVLM_INT4_PREFILL_BK", "0"))


def _prefill4_vmem_est(bm: int, bn: int, bk: int, group: int) -> int:
    """Scoped-VMEM working-set estimate for one prefill4 grid step: double-
    buffered x and weight/scale tiles, the bf16 dequant temp (bk*bn — the
    largest single buffer at full-d contraction), the f32 accumulator
    scratch, and the double-buffered f32 output block."""
    x_db = 2 * bm * bk * 2
    w_db = 2 * ((bk // 2) * bn + 4 * (bk // group) * bn)
    dequant = bk * bn * 2
    acc_and_out = bm * bn * 4 + 2 * bm * bn * 4
    return x_db + w_db + dequant + acc_and_out


# Budget just under the 16 MB scoped limit: keeps every measured-green
# tuned config (eval prefill m=398 est 15.4M, train B=1 m=684 est 14.2M)
# but rejects block_m=456/bk=4096 (B=4 train bwd: the remat'd pallas_call
# died at compile with "scoped allocation 16.66M > 16M" — 2026-08-18; the
# estimate put that config at 16.69M, matching the compiler's number)
_PREFILL4_VMEM_BUDGET = int(
    _os.environ.get("HANDSONVLM_INT4_PREFILL_VMEM", str(15_900_000))
)


def _prefill4_blocks(m: int, d: int, n: int, group: int,
                     fixed_bn: bool = False):
    # balance the m-grid: bm=256 at m=398 pads to 2x256=512 rows (29% wasted
    # MXU work); instead split m as evenly as the 8-row granularity allows
    # over the same number of blocks (m=398 -> 2x200 rows, 0.5% pad)
    nb_m = -(-max(m, 8) // PREFILL4_BLOCK_M)
    block_m = min(PREFILL4_BLOCK_M, -(-(-(-max(m, 8) // nb_m)) // 8) * 8)
    bn = PREFILL4_BLOCK_N
    # fixed_bn: the tiled layout's output block IS its tile width n — the
    # VMEM estimate must use it, or the guard under-counts and the kernel
    # dies at compile (seen at m=6344: est with bn=256 passed, the real
    # bn=512 kernel blew the 16 MB scoped limit by 1.68M)
    block_n = n if fixed_bn else (bn if n % bn == 0 else _pick_block_n(n, d // 2))
    # contraction tile: default full-d when it fits (<=4096); the sweep
    # knob (HANDSONVLM_INT4_PREFILL_BK / PREFILL4_BLOCK_K) caps it so the
    # MFU tuning can trade VMEM working set vs accumulation passes
    want_k = PREFILL4_BLOCK_K or (d if d <= 4096 else math.gcd(d, 2048))
    block_k = min(want_k, d)
    while block_k > group and (d % block_k or block_k % group):
        block_k //= 2
    block_k = max(block_k, group)
    # VMEM budget guard: large-batch training shapes (block_m near 512 at
    # full-d block_k) exceed the ~16 MB scoped limit; shed the contraction
    # tile first (2 accumulation passes beat a stalled compile), rows last
    def _next_k(bk):
        # largest legal contraction tile below bk: must divide d AND stay a
        # multiple of group (plain halving breaks both at 13B shapes, e.g.
        # d=13824 -> 1728 is not a multiple of 128)
        for cand in range(bk - group, group - 1, -group):
            if d % cand == 0:
                return cand
        return None

    while _prefill4_vmem_est(block_m, block_n, block_k, group) > _PREFILL4_VMEM_BUDGET:
        nk = _next_k(block_k) if block_k > group else None
        if nk is not None:
            block_k = nk
        elif block_m > 64:
            block_m = -(-(block_m // 2) // 8) * 8
        else:
            break
    return block_m, block_n, block_k


def int4_matmul_prefill(
    x: jnp.ndarray, w4_all: jnp.ndarray, gs_all: jnp.ndarray, layer_idx
) -> jnp.ndarray:
    """Prefill-sized x (m >= ~128, d) @ dequant(w4_all[layer_idx]): dequant
    to bf16 in VMEM + full-contraction bf16 MXU dots (f32 accumulation,
    scales folded into the bf16 weights — the decode kernel's exact
    on-f32-dot-output scaling costs nothing there because its dots are
    group-batched; here one big dot per block wants one weight matrix).
    Same stacked scalar-prefetch layer selection as int4_matmul_stacked."""
    shape = x.shape
    L, G, half, n = w4_all.shape
    group = half * 2
    d = G * group
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    m = x2.shape[0]
    block_m, block_n, block_k = _prefill4_blocks(m, d, n, group)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    gk = block_k // group

    def kernel(l_ref, *refs):
        _prefill4_kernel(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n // block_n, d // block_k),
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, ki, l: (i, ki)),
                pl.BlockSpec(
                    (1, gk, half, block_n), lambda i, j, ki, l: (l[0], ki, 0, j)
                ),
                pl.BlockSpec(
                    (1, gk, 1, block_n), lambda i, j, ki, l: (l[0], ki, 0, j)
                ),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x2, w4_all,
      gs_all[:, :, None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def _prefill4_tiled_kernel(xr_ref, w_ref, s_ref, o_ref, acc_ref):
    # tiled-layout variant of _prefill4_kernel: w (1,1,gk,g/2,BN) contiguous
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[0, 0].astype(jnp.int32)  # (gk, g/2, BN)
    sc = s_ref[0, 0].astype(jnp.bfloat16)  # (gk, 1, BN): singleton kept so
    # the block's constrained last-two dims are (1, BN) — gk can be tiny
    lo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * sc
    hi = (p >> 4).astype(jnp.bfloat16) * sc
    gk, half, bn = lo.shape
    wdq = jnp.concatenate([lo, hi], axis=1).reshape(gk * 2 * half, bn)
    acc_ref[:] += jax.lax.dot_general(
        xr_ref[:], wdq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:]


def int4_matmul_prefill_tiled(x, w4t, gst, layer_idx):
    """Prefill-sized matmul over the tiled layout (int4_matmul_prefill
    semantics; see tile_int4_stacked for the layout)."""
    shape = x.shape
    L, NB, G, half, BN = w4t.shape
    group = half * 2
    d = G * group
    x2 = x.reshape(-1, d).astype(jnp.bfloat16)
    m = x2.shape[0]
    block_m, _, block_k = _prefill4_blocks(m, d, BN, group, fixed_bn=True)
    gk = block_k // group
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])

    def kernel(l_ref, *refs):
        _prefill4_tiled_kernel(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, NB, d // block_k),
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, ki, l: (i, ki)),
                pl.BlockSpec(
                    (1, 1, gk, half, BN), lambda i, j, ki, l: (l[0], j, ki, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, gk, 1, BN), lambda i, j, ki, l: (l[0], j, ki, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((block_m, BN), lambda i, j, ki, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, BN), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, NB * BN), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x2, w4t,
      gst[:, :, :, None, :])
    return out[:m].reshape(shape[:-1] + (NB * BN,)).astype(x.dtype)


def _prefill4t_kernel(dy_ref, w_ref, s_ref, o_ref, acc_ref):
    # Transpose product for the VJP: dx_block (bm, bd) += dy (bm, bn) @
    # dequant(w)^T. Same VMEM dequant as _prefill4_kernel; the dot
    # contracts both operands' minor dim (rhs-transposed MXU form).
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[0].astype(jnp.int32)  # (GK, g/2, bn)
    s = s_ref[0].astype(jnp.bfloat16)  # (GK, 1, bn)
    lo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * s
    hi = (p >> 4).astype(jnp.bfloat16) * s
    gk, half, bn = lo.shape
    wdq = jnp.concatenate([lo, hi], axis=1).reshape(gk * 2 * half, bn)  # (bd, bn)
    acc_ref[:] += jax.lax.dot_general(
        dy_ref[:], wdq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:]


def _pick_div(total: int, candidates, fallback: int) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return fallback


def _prefill4t_tiled_kernel(dy_ref, w_ref, s_ref, o_ref, acc_ref):
    # tiled-layout transpose product: dx (bm, bd) += dy (bm, BN) @ W^T
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = w_ref[0, 0].astype(jnp.int32)  # (gk, g/2, BN)
    sc = s_ref[0, 0].astype(jnp.bfloat16)  # (gk, 1, BN) — see prefill kernel
    lo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * sc
    hi = (p >> 4).astype(jnp.bfloat16) * sc
    gk, half, bn = lo.shape
    wdq = jnp.concatenate([lo, hi], axis=1).reshape(gk * 2 * half, bn)
    acc_ref[:] += jax.lax.dot_general(
        dy_ref[:], wdq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ni == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:]


def _int4_stacked_T_tiled(dy, w4t, gst, layer_idx):
    shape = dy.shape
    L, NB, G, half, BN = w4t.shape
    group = half * 2
    d = G * group
    dy2 = dy.reshape(-1, NB * BN).astype(jnp.bfloat16)
    m = dy2.shape[0]
    block_m = min(256, max(m, 8))
    cand = tuple(c for c in (512, 256, 128) if c <= INT4_T_BD)
    bd = _pick_div(d, cand, d)
    if bd % group or d % bd:
        bd = d
    gk = bd // group
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        dy2 = jnp.pad(dy2, [(0, m_pad - m), (0, 0)])

    def kernel(l_ref, *refs):
        _prefill4t_tiled_kernel(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, d // bd, NB),
            in_specs=[
                pl.BlockSpec((block_m, BN), lambda i, di, ni, l: (i, ni)),
                pl.BlockSpec(
                    (1, 1, gk, half, BN), lambda i, di, ni, l: (l[0], ni, di, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, gk, 1, BN), lambda i, di, ni, l: (l[0], ni, di, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((block_m, bd), lambda i, di, ni, l: (i, di)),
            scratch_shapes=[pltpu.VMEM((block_m, bd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), dy2, w4t,
      gst[:, :, :, None, :])
    return out[:m, :d].reshape(shape[:-1] + (d,)).astype(dy.dtype)


def int4_matmul_stacked_T(
    dy: jnp.ndarray, w4_all: jnp.ndarray, gs_all: jnp.ndarray, layer_idx
) -> jnp.ndarray:
    """dy (..., n) @ dequant(w4_all[layer_idx])^T -> (..., d): the VJP of
    int4_matmul_stacked w.r.t. its input (QLoRA: gradients flow THROUGH the
    frozen int4 projections to earlier layers and the LoRA adapters, which
    is all a frozen-base fine-tune needs — no weight gradients)."""
    if w4_all.ndim == 5:  # tiled layout (tile_int4_stacked)
        return _int4_stacked_T_tiled(dy, w4_all, gs_all, layer_idx)
    shape = dy.shape
    L, G, half, n = w4_all.shape
    group = half * 2
    d = G * group
    dy2 = dy.reshape(-1, n).astype(jnp.bfloat16)
    m = dy2.shape[0]
    block_m = min(256, max(m, 8))
    cand = tuple(c for c in (512, 256, 128) if c <= INT4_T_BD)
    bd = _pick_div(d, cand, d)
    if bd % group or d % bd:
        bd = d
    bn = _pick_div(n, tuple(c for c in (512, 256, 128) if c <= INT4_T_BN), n)
    gk = bd // group
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        dy2 = jnp.pad(dy2, [(0, m_pad - m), (0, 0)])

    def kernel(l_ref, *refs):
        _prefill4t_kernel(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, d // bd, n // bn),
            in_specs=[
                pl.BlockSpec((block_m, bn), lambda i, di, ni, l: (i, ni)),
                pl.BlockSpec(
                    (1, gk, half, bn), lambda i, di, ni, l: (l[0], di, 0, ni)
                ),
                pl.BlockSpec(
                    (1, gk, 1, bn), lambda i, di, ni, l: (l[0], di, 0, ni)
                ),
            ],
            out_specs=pl.BlockSpec((block_m, bd), lambda i, di, ni, l: (i, di)),
            scratch_shapes=[pltpu.VMEM((block_m, bd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), dy2, w4_all,
      gs_all[:, :, None, :])
    return out[:m, :d].reshape(shape[:-1] + (d,)).astype(dy.dtype)


def _zero_ct(x):
    """Cotangent for a frozen quantized leaf: float0 for int dtypes (JAX's
    cotangent type for non-differentiable primals), zeros otherwise."""
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


def _int4_matmul_stacked_impl(
    x: jnp.ndarray, w4_all: jnp.ndarray, gs_all: jnp.ndarray, layer_idx
) -> jnp.ndarray:
    """x (..., d) @ dequant(w4_all (L, G, g/2, n)[layer_idx]) — for use
    INSIDE a layer scan: the full stacked weight buffer stays a scan
    constant and the layer is selected by a scalar-prefetched index in the
    BlockSpec index_map. Slicing the layer in XLA instead makes the
    pallas operand a materialized COPY (slice-read + copy-write +
    kernel-read = 3x HBM traffic): measured 11.3 -> 7.7 ms/step for the 7B
    GEMV chain (tools/perf_int4_variants.py; raw int8 DMA is full-rate,
    tools/perf_pallas_dma.py).

    Prefill-sized inputs (m >= INT4_PREFILL_MIN_M rows) dispatch to
    int4_matmul_prefill: dequant-to-bf16 full-contraction MXU dots beat the
    group-batched GEMV formulation once compute (not weight streaming)
    dominates.

    Accepts either layout: 4-D (L, G, g/2, n) flat, or the 5-D tiled
    (L, NB, G, g/2, BN) from tile_int4_stacked (contiguous weight-tile DMA
    — the production layout)."""
    if w4_all.ndim == 5:
        nrows = int(np.prod(x.shape[:-1])) if x.shape[:-1] else 1
        if nrows >= INT4_PREFILL_MIN_M:
            return int4_matmul_prefill_tiled(x, w4_all, gs_all, layer_idx)
        return _int4_gemv_tiled(x, w4_all, gs_all, layer_idx)
    shape = x.shape
    L, G, half, n = w4_all.shape
    d = G * half * 2
    if shape[:-1] and int(np.prod(shape[:-1])) >= INT4_PREFILL_MIN_M:
        return int4_matmul_prefill(x, w4_all, gs_all, layer_idx)
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks_int4(m, G, half, n)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xlo, xc, sx8 = _split_x_halves(x2, G, half * 2)

    def kernel(l_ref, *refs):  # scalar-prefetch ref arrives first
        _gemv4_kernel(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n // block_n),
            in_specs=[
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((block_m, G), lambda i, j, l: (i, 0)),
                pl.BlockSpec((1, G, half, block_n), lambda i, j, l: (l[0], 0, 0, j)),
                pl.BlockSpec((1, G, block_n), lambda i, j, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xlo, xc, sx8, w4_all, gs_all)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


@jax.custom_vjp
def int4_matmul_stacked(x, w4_all, gs_all, layer_idx):
    """Differentiable front for _int4_matmul_stacked_impl: pallas calls have
    no automatic VJP, so QLoRA training (frozen int4 base + LoRA) defines
    d/dx = dy @ W^T via int4_matmul_stacked_T; the quantized leaves and the
    layer index get zero/float0 cotangents (they are frozen by construction
    — int4 weights are not meaningfully trainable)."""
    return _int4_matmul_stacked_impl(x, w4_all, gs_all, layer_idx)


def _int4_stacked_fwd(x, w4_all, gs_all, layer_idx):
    out = _int4_matmul_stacked_impl(x, w4_all, gs_all, layer_idx)
    return out, (w4_all, gs_all, layer_idx, jnp.zeros((0,), x.dtype))


def _int4_stacked_bwd(res, dy):
    w4_all, gs_all, layer_idx, xdt = res
    dx = int4_matmul_stacked_T(dy, w4_all, gs_all, layer_idx).astype(xdt.dtype)
    return dx, _zero_ct(w4_all), _zero_ct(gs_all), _zero_ct(layer_idx)


int4_matmul_stacked.defvjp(_int4_stacked_fwd, _int4_stacked_bwd)


def quantize_llama_int4(llama_params: dict, group: int = INT4_GROUP) -> dict:
    """bf16/f32 llama tree -> int4 weight-only (decoder projections).
    7B: 13.5 GB -> ~3.6 GB of projection weights.

    Emits FUSED stacked leaves under layers["int4"]:
      wqkv (q,k,v concat on dout), wo, wgu (gate,up concat), w_down
    — 4 pallas calls/layer instead of 7 (per-call overhead is ~12 us), and
    the stacked (L, ...) buffers feed int4_matmul_stacked's scalar-prefetch
    layer indexing inside the decoder scan (avoids the scan-slice copy)."""
    out = dict(llama_params)
    attn = llama_params["layers"]["attn"]
    mlp = llama_params["layers"]["mlp"]
    fused = {
        "wqkv": [attn["wq"], attn["wk"], attn["wv"]],
        "wo": [attn["wo"]],
        "wgu": [mlp["w_gate"], mlp["w_up"]],
        "w_down": [mlp["w_down"]],
    }

    def quant_stacked(ws):  # list of (L, din, dout_i), concat on dout
        L = ws[0].shape[0]
        qs = [
            quantize_int4(jnp.concatenate([w[i] for w in ws], axis=1), group)
            for i in range(L)
        ]
        w4 = jnp.stack([q["w4"] for q in qs])
        gs = jnp.stack([q["gscale"] for q in qs])
        return tile_int4_stacked(w4, gs)

    out["layers"] = {
        "int4": {k: quant_stacked(v) for k, v in fused.items()},
        "attn_norm": llama_params["layers"]["attn_norm"],
        "mlp_norm": llama_params["layers"]["mlp_norm"],
    }
    return quantize_lm_head(out)


def maybe_int8_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w where w is a dense array, an int8 {"w8","scale"} leaf, or an
    int4 {"w4","gscale"} leaf.

    The structure check is trace-time (pytree structure is static under
    jit), so each layout compiles to its own straight-line program.
    """
    if isinstance(w, dict):
        if "w4" in w:
            return int4_matmul(x, w["w4"], w["gscale"])
        if INT8_IMPL == "xla":
            y = jax.lax.dot_general(
                x, w["w8"].astype(x.dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * w["scale"]).astype(x.dtype)
        shape = x.shape
        y = int8_matmul(x.reshape(-1, shape[-1]), w["w8"], w["scale"])
        return y.reshape(shape[:-1] + (w["w8"].shape[1],)).astype(x.dtype)
    return x @ w
