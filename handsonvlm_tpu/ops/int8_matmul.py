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
    return out


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
            p["lm_head"] = {"weight": (jax.random.normal(ks[1], (d, cfg.padded_vocab_size)) * 0.02).astype(dtype)}
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


INT8_IMPL = "xla"  # "xla" | "pallas" — see module docstring for numbers

INT4_GROUP = 128  # contraction-group size for int4 scales


def quantize_int4(w: jnp.ndarray, group: int = INT4_GROUP) -> dict:
    """Group-wise symmetric int4: w (d, n) -> {"w4" (G, g/2, n) int8 with
    two nibbles per byte, "gscale" (G, n) f32}, d = G*g. Per-(group,
    out-channel) scales keep the 4-bit error local (bitsandbytes-nf4-style
    blocking, reference builder.py:22-31 4-bit load path).

    Packing: within each group, row r pairs with row r + g/2 — the LOW
    nibble holds the first half of the group's rows, the HIGH nibble the
    second half, so unpacking is a contiguous concat (VMEM-friendly in the
    Pallas kernel; an even/odd interleave would need a relayout). Values
    are nibble-packed into int8 rather than stored as jnp.int4: sub-byte
    (S4) arrays crash this backend's jit argument transfer."""
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
    packed = ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)
    return {"w4": packed, "gscale": scale.astype(jnp.float32)}


def _unpack_int4(packed: jnp.ndarray, dtype) -> jnp.ndarray:
    """(G, g/2, n) nibble-packed int8 -> (G, g, n) values in `dtype`
    (half-split packing; arithmetic shifts sign-extend each nibble)."""
    lo = ((packed << 4) >> 4).astype(dtype)  # low nibble, sign-extended
    hi = (packed >> 4).astype(dtype)  # high nibble (arithmetic shift)
    return jnp.concatenate([lo, hi], axis=1)


def _gemv4_kernel(x_ref, w_ref, s_ref, o_ref):
    # x (bm, d) bf16; w (G, g/2, bn) packed int8; s (G, bn) f32.
    # Nibble unpack in i32: Mosaic cannot legalize shifts on i8 vectors
    # (arith.shli fails to legalize), and i32 >> / & lower cleanly.
    p32 = w_ref[:].astype(jnp.int32)
    hi = (p32 >> 4).astype(jnp.bfloat16)  # arithmetic: sign-extends
    r = p32 & 15
    lo = (r - jnp.where(r >= 8, 16, 0)).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=1)  # (G, g, bn)
    w = w * s_ref[:][:, None, :].astype(jnp.bfloat16)
    G, g, bn = w.shape
    w = w.reshape(G * g, bn)
    y = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = y


def int4_matmul(x: jnp.ndarray, w4: jnp.ndarray, gscale: jnp.ndarray) -> jnp.ndarray:
    """x (..., d) @ dequant(nibble-packed w4 (G, g/2, n)) -> (..., n).

    Pallas kernel: int4 weights stream to VMEM packed and dequantize
    on-chip. XLA formulations materialize the unpacked bf16 matrix in HBM
    (measured 113-188 ms/step for the 7B chain vs ~5 ms int4 floor)."""
    shape = x.shape
    G, half, n = w4.shape
    d = G * half * 2
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, d // 2, n)  # packed bytes ~ d/2
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4 = jnp.pad(w4, [(0, 0), (0, 0), (0, n_pad - n)])
        gscale = jnp.pad(gscale, [(0, 0), (0, n_pad - n)])

    out = pl.pallas_call(
        _gemv4_kernel,
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, half, block_n), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=_interpret(),
    )(x2.astype(jnp.bfloat16), w4, gscale)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def quantize_llama_int4(llama_params: dict, group: int = INT4_GROUP) -> dict:
    """bf16/f32 llama tree -> int4 weight-only (decoder projections).
    7B: 13.5 GB -> ~3.6 GB of projection weights."""
    out = dict(llama_params)
    layers = dict(llama_params["layers"])

    def quant_stacked(w):  # (L, din, dout)
        qs = [quantize_int4(w[i], group) for i in range(w.shape[0])]
        return {"w4": jnp.stack([q["w4"] for q in qs]),
                "gscale": jnp.stack([q["gscale"] for q in qs])}

    for grp in ("attn", "mlp"):
        layers[grp] = {k: quant_stacked(v) for k, v in llama_params["layers"][grp].items()}
    out["layers"] = {
        **layers,
        "attn_norm": llama_params["layers"]["attn_norm"],
        "mlp_norm": llama_params["layers"]["mlp_norm"],
    }
    return out


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
