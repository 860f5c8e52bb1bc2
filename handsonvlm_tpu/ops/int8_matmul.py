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


def quantize_llama(llama_params: dict) -> dict:
    """bf16/f32 llama tree -> int8 weight-only tree (decoder projections).

    Each projection leaf becomes {"w8": (L, din, dout) int8,
    "scale": (L, dout) f32}; embed/norms/lm_head stay as-is. Roughly halves
    decode HBM traffic and model memory (7B: 13.5 GB -> ~7.5 GB; 13B fits a
    single 16 GB chip).
    """
    out = dict(llama_params)
    layers = dict(llama_params["layers"])

    def quant_stacked(w):  # (L, din, dout)
        w8s, scales = [], []
        for i in range(w.shape[0]):
            w8, s = quantize_int8(w[i])
            w8s.append(w8)
            scales.append(s)
        return {"w8": jnp.stack(w8s), "scale": jnp.stack(scales)}

    for grp in ("attn", "mlp"):
        layers[grp] = {k: quant_stacked(v) for k, v in llama_params["layers"][grp].items()}
    out["layers"] = {
        **layers,
        "attn_norm": llama_params["layers"]["attn_norm"],
        "mlp_norm": llama_params["layers"]["mlp_norm"],
    }
    return out


INT8_IMPL = "xla"  # "xla" | "pallas" — see module docstring for numbers


def maybe_int8_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w where w is either a dense array or an int8 {"w8","scale"} leaf.

    The structure check is trace-time (pytree structure is static under
    jit), so both layouts compile to their own straight-line program.
    """
    if isinstance(w, dict):
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
