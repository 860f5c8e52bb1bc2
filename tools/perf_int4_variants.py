"""Int4 decode-kernel shootout at 7B GEMV shapes (B=1).

The shipped kernel (ops/int8_matmul._gemv4_kernel) measured 21.3 ms/step —
~4x over the ~5 ms int4 streaming floor. Arithmetic says it is VPU-bound on
the nibble unpack: cast/shift/mask/select/concat/scale-mul ≈ 9-10 vector ops
per weight element x 6.7G elements ≈ 20 ms. Variants here cut ops/element:

  v0_current   shipped kernel (baseline re-measure)
  v2_flat      biased-lo packing; extract only the high nibble (3 ops/byte),
               low nibble recovered algebraically via
                 x_lo.lo + x_hi.hi = x_lo.byte + (x_hi-16.x_lo).hi + 8.sum(x_lo)
               scales applied per-element to byte/hi (2 flat MXU dots + a
               small correction dot) -> ~6 ops/byte
  v1_batched   same identity, but per-group batched dots so the scale
               multiply lands on the (G,m,n) dot outputs instead of every
               weight element -> ~4 ops/byte
  int8_xla     w8bf16 reference (the 11.1 ms/step throughput mode)

Each variant: fori chunk of K=16 steps over a full 32-layer 7-projection
chain, fresh inputs, device_get sync (CLAUDE.md timing rules).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int4_variants.py
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import (  # noqa: E402
    INT4_GROUP,
    _cdiv,
    _pick_blocks,
    int4_matmul,
)

K = 16


# ---------------------------------------------------------------------------
# v2_flat: biased-lo packing, flat dots, per-element scales on byte/hi
# ---------------------------------------------------------------------------


def _gemv4_flat_kernel(xlo_ref, xc_ref, sx_ref, w_ref, s_ref, o_ref):
    # xlo/xc (bm, d/2) bf16; sx (bm, G) bf16; w (G, half, bn) int8; s (G, bn) f32
    G, half, bn = w_ref.shape
    s = s_ref[:].astype(jnp.bfloat16)[:, None, :]  # (G,1,bn)
    byte = w_ref[:].astype(jnp.bfloat16) * s
    hi = ((w_ref[:].astype(jnp.int32) >> 4).astype(jnp.bfloat16)) * s
    byte = byte.reshape(G * half, bn)
    hi = hi.reshape(G * half, bn)
    dn = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(sx_ref[:], s_ref[:], dn, preferred_element_type=jnp.float32)
    o_ref[:] = y


# ---------------------------------------------------------------------------
# v1_batched: per-group batched dots; scales on the (G,bm,bn) dot outputs
# ---------------------------------------------------------------------------


def _make_batched_kernel(hi_mode):
    def kernel(xlo_ref, xc_ref, sx_ref, w_ref, s_ref, o_ref):
        # xlo/xc (G, bm, half) bf16; sx (bm, G) bf16; w (G, half, bn) int8; s (G, bn) f32
        byte = w_ref[:].astype(jnp.bfloat16)
        if hi_mode == "i32":
            hi = (w_ref[:].astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        elif hi_mode == "i16":
            hi = (w_ref[:].astype(jnp.int16) >> 4).astype(jnp.bfloat16)
        elif hi_mode == "f32":
            # f32 unpack (bf16 floor does not legalize on this backend);
            # dots take the f32 operands directly
            byte = w_ref[:].astype(jnp.float32)
            hi = jnp.floor(byte * 0.0625)
        elif hi_mode == "bound":
            # WRONG MATH — perf lower bound: one cast, no hi extraction
            hi = byte
        elif hi_mode == "floor":
            # byte = 16*hi + u, u in [0,16) => floor(byte/16) == hi, exact in
            # bf16 (|byte| <= 128 has an exact bf16 representation, /16 is a
            # power-of-2 scale). Reuses the bf16 cast needed for the dot:
            # 3 VPU ops/byte total vs 4 for the i32 shift route.
            hi = jnp.floor(byte * 0.0625)
        else:
            raise ValueError(hi_mode)
        dn = (((2,), (1,)), ((0,), (0,)))  # batch G, contract half
        a = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
        a += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
        y = jnp.sum(a * s_ref[:][:, None, :], axis=0)  # (bm, bn)
        y += jax.lax.dot_general(
            sx_ref[:], s_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y

    return kernel


def _prep_x(x2, G, group, flat):
    """x (m,d) -> xlo, xc = xhi - 16*xlo, sx = -8*sum(xlo) in kernel layout."""
    m, d = x2.shape
    half = group // 2
    xr = x2.reshape(m, G, group)
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi.astype(jnp.float32) - 16.0 * xlo.astype(jnp.float32)).astype(jnp.bfloat16)
    # byte = 16*hi + (lo+8) => xlo.byte + xc.hi = xlo.lo + xhi.hi + 8*sum(xlo);
    # the +8*sum(xlo) excess is removed by adding sx @ s with sx = -8*sum(xlo)
    sx = (-8.0 * jnp.sum(xlo.astype(jnp.float32), axis=2)).astype(jnp.bfloat16)  # (m,G)
    if flat:
        return (xlo.reshape(m, d // 2).astype(jnp.bfloat16),
                xc.reshape(m, d // 2), sx)
    return (xlo.transpose(1, 0, 2).astype(jnp.bfloat16),
            xc.transpose(1, 0, 2), sx)


def int4_matmul_v2(x, w4, gscale, *, batched, hi_mode="i32", block_n_override=None):
    shape = x.shape
    G, half, n = w4.shape
    group = half * 2
    d = G * group
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, d // 2, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4 = jnp.pad(w4, [(0, 0), (0, 0), (0, n_pad - n)])
        gscale = jnp.pad(gscale, [(0, 0), (0, n_pad - n)])
    xlo, xc, sx = _prep_x(x2.astype(jnp.bfloat16), G, group, flat=not batched)

    if batched:
        kernel = _make_batched_kernel(hi_mode)
        x_specs = [
            pl.BlockSpec((G, block_m, half), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_m, half), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = _gemv4_flat_kernel
        x_specs = [
            pl.BlockSpec((block_m, d // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=x_specs + [
            pl.BlockSpec((block_m, G), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, half, block_n), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xlo, xc, sx, w4, gscale)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


# ---------------------------------------------------------------------------
# packing + reference dequant (biased-lo layout)
# ---------------------------------------------------------------------------


def pack_biased(q, group):
    """q (d, n) int in [-8,7] -> (G, g/2, n) int8; byte = 16*hi + (lo+8)."""
    d, n = q.shape
    G, half = d // group, group // 2
    qr = q.reshape(G, group, n)
    lo, hi = qr[:, :half, :], qr[:, half:, :]
    return (((lo + 8) & 0x0F) | (hi << 4)).astype(jnp.int8)


def dequant_biased(packed, gscale):
    G, half, n = packed.shape
    p32 = packed.astype(jnp.int32)
    hi = p32 >> 4
    lo = (p32 & 15) - 8
    q = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    return (q * gscale[:, None, :]).reshape(G * half * 2, n)


def rand_tree(key, cfg):
    """Random packed int4 7B projection tree (no bf16 transients)."""
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wq": (d, h * hd), "wk": (d, kv * hd), "wv": (d, kv * hd),
        "wo": (h * hd, d), "w_gate": (d, f), "w_up": (d, f), "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L"))
    def draw(k, din, dout, L):
        G = din // INT4_GROUP
        w4 = jax.random.randint(k, (L, G, INT4_GROUP // 2, dout), -128, 128, jnp.int32).astype(jnp.int8)
        gs = jnp.full((L, G, dout), 0.02 / 4.0, jnp.float32)
        return {"w4": w4, "gscale": gs}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        tree[name] = draw(k, din, dout, L)
        jax.block_until_ready(tree[name]["w4"])
    return tree


def rand_tree_fused(key, cfg, group=INT4_GROUP):
    """Fused-projection tree: qkv concat along dout, gate+up concat along
    dout — 4 pallas calls/layer instead of 7 (amortizes per-call pipeline
    ramp over longer grids)."""
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wqkv": (d, (h + 2 * kv) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L", "group"))
    def draw(k, din, dout, L, group):
        G = din // group
        w4 = jax.random.randint(k, (L, G, group // 2, dout), -128, 128, jnp.int32).astype(jnp.int8)
        gs = jnp.full((L, G, dout), 0.02 / 4.0, jnp.float32)
        return {"w4": w4, "gscale": gs}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        g = group if din % group == 0 else math.gcd(din, group)
        tree[name] = draw(k, din, dout, L, g)
        jax.block_until_ready(tree[name]["w4"])
    return tree


def make_chain_fused(cfg, block_n=None):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def proj(x, w):
        return int4_matmul_v2(
            x, w["w4"], w["gscale"], batched=True, hi_mode="f32",
            block_n_override=block_n,
        ).astype(jnp.bfloat16)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                qkv = proj(x, lp["wqkv"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + proj(a, lp["wo"])
                gu = proj(x, lp["wgu"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def _gemv4_factored_kernel(xlo_ref, xc_ref, sx_ref, w_ref, col_ref, o_ref):
    """Factorized scales s[G,n] ~ row[G]*col[n]: row folded into xlo/xc
    outside, col applied to the (bm,bn) output — zero per-element weight
    scaling and two FULL-depth flat dots (contraction d/2) instead of G
    latency-bound 64-deep batched dots.
    xlo/xc (bm, d/2) bf16 (row-scaled); sx (bm, 1) f32 = -8*sum(row*xlo_G);
    w (G, half, bn) int8; col (1, bn) f32."""
    G, half, bn = w_ref.shape
    byte = w_ref[:].astype(jnp.float32).reshape(G * half, bn)
    hi = jnp.floor(byte * 0.0625)
    dn = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    o_ref[:] = (y + sx_ref[:]) * col_ref[:]


def int4_matmul_factored(x, w4, row, col, *, block_n_override=None):
    """x (.., d) @ dequant(w4; s=row[G]⊗col[n]) -> (.., n)."""
    shape = x.shape
    G, half, n = w4.shape
    group = half * 2
    d = G * group
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, d // 2, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4 = jnp.pad(w4, [(0, 0), (0, 0), (0, n_pad - n)])
        col = jnp.pad(col, [(0, n_pad - n)])
    xr = x2.reshape(m_pad, G, group) * row[None, :, None]  # row scales -> x
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx = (-8.0 * jnp.sum(xlo, axis=(1, 2), keepdims=False))[:, None]  # (m,1) f32
    xlo = xlo.reshape(m_pad, d // 2).astype(jnp.bfloat16)
    xc = xc.reshape(m_pad, d // 2)

    out = pl.pallas_call(
        _gemv4_factored_kernel,
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_m, d // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, half, block_n), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xlo, xc, sx, w4, col[None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def _gemv4_rowmajor_kernel(xlo_ref, xc_ref, sx_ref, w_ref, col_ref, o_ref):
    """Like _gemv4_factored_kernel but with N-MAJOR weight storage
    w (bn, d/2): each grid block is one fully contiguous HBM region (the
    (G, half, bn) layout sliced n-minor gives only 512-byte DMA runs for
    int8 — suspected cause of the shared ~300 GB/s floor)."""
    byte = w_ref[:].astype(jnp.float32)
    hi = jnp.floor(byte * 0.0625)
    dn = (((1,), (1,)), ((), ()))  # contract d/2 on both (A @ B^T)
    y = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    o_ref[:] = (y + sx_ref[:]) * col_ref[:]


def int4_matmul_rowmajor(x, w4t, row, col, *, block_n_override=None):
    """x (.., d) @ dequant(w4t (n, d/2) n-major packed; s=row⊗col) -> (.., n)."""
    shape = x.shape
    n, half_d = w4t.shape
    d = half_d * 2
    G = row.shape[0]
    group = d // G
    half = group // 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, half_d, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4t = jnp.pad(w4t, [(0, n_pad - n), (0, 0)])
        col = jnp.pad(col, [(0, n_pad - n)])
    xr = x2.reshape(m_pad, G, group) * row[None, :, None]
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx = (-8.0 * jnp.sum(xlo, axis=(1, 2)))[:, None]
    xlo = xlo.reshape(m_pad, half_d).astype(jnp.bfloat16)
    xc = xc.reshape(m_pad, half_d)

    out = pl.pallas_call(
        _gemv4_rowmajor_kernel,
        grid=(m_pad // block_m, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, half_d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xlo, xc, sx, w4t, col[None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def _make_rowmajor_sliced_kernel(k_slice):
    """Rowmajor kernel with the unpack k-sliced inside the body: f32
    intermediates stay (bn, k_slice) so block_n can grow to 1-2k —
    fewer grid steps (the ~2us/step fixed cost dominates at block 512)."""
    def kernel(xlo_ref, xc_ref, sx_ref, w_ref, col_ref, o_ref):
        bn, half_d = w_ref.shape
        bm = xlo_ref.shape[0]
        y = jnp.zeros((bm, bn), jnp.float32)
        dn = (((1,), (1,)), ((), ()))
        for kk in range(0, half_d, k_slice):
            byte = w_ref[:, kk:kk + k_slice].astype(jnp.float32)
            hi = jnp.floor(byte * 0.0625)
            y += jax.lax.dot_general(
                xlo_ref[:, kk:kk + k_slice], byte, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(
                xc_ref[:, kk:kk + k_slice], hi, dn, preferred_element_type=jnp.float32)
        o_ref[:] = (y + sx_ref[:]) * col_ref[:]

    return kernel


def int4_matmul_rm_sliced(x, w4t, row, col, *, block_n, k_slice):
    shape = x.shape
    n, half_d = w4t.shape
    d = half_d * 2
    G = row.shape[0]
    group = d // G
    half = group // 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m = max(min(256, m), 8)
    bn = min(block_n, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, bn) * bn
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4t = jnp.pad(w4t, [(0, n_pad - n), (0, 0)])
        col = jnp.pad(col, [(0, n_pad - n)])
    xr = x2.reshape(m_pad, G, group) * row[None, :, None]
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx = (-8.0 * jnp.sum(xlo, axis=(1, 2)))[:, None]
    xlo = xlo.reshape(m_pad, half_d).astype(jnp.bfloat16)
    xc = xc.reshape(m_pad, half_d)

    out = pl.pallas_call(
        _make_rowmajor_sliced_kernel(k_slice),
        grid=(m_pad // block_m, n_pad // bn),
        in_specs=[
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, half_d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xlo, xc, sx, w4t, col[None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def make_chain_rm_sliced(cfg, block_n, k_slice):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def proj(x, w):
        return int4_matmul_rm_sliced(
            x, w["w4t"], w["row"], w["col"], block_n=block_n, k_slice=k_slice
        ).astype(jnp.bfloat16)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                qkv = proj(x, lp["wqkv"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + proj(a, lp["wo"])
                gu = proj(x, lp["wgu"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def _make_rm_true_kernel(k_slice, group_half):
    """Sliced big-block kernel with TRUE per-(group, n) scales applied
    per-element in-slice (VPU ops are near-free below the step-count floor;
    this keeps group-128/256 quant quality without the rank-1 factorization).
    Packed column c belongs to group c // group_half."""
    def kernel(xlo_ref, xc_ref, sx8_ref, w_ref, st_ref, o_ref):
        bn, half_d = w_ref.shape
        bm = xlo_ref.shape[0]
        dn = (((1,), (1,)), ((), ()))
        # correction: -8 * sum_G s[G,n] * sum(xlo_G)  (sx8 = -8*per-group sums)
        y = jax.lax.dot_general(sx8_ref[:], st_ref[:], dn, preferred_element_type=jnp.float32)
        for kk in range(0, half_d, k_slice):
            byte = w_ref[:, kk:kk + k_slice].astype(jnp.float32)
            hi = jnp.floor(byte * 0.0625)
            g0, g1 = kk // group_half, (kk + k_slice) // group_half
            srep = jnp.repeat(st_ref[:, g0:g1], group_half, axis=1)  # (bn, ks)
            byte = byte * srep
            hi = hi * srep
            y += jax.lax.dot_general(
                xlo_ref[:, kk:kk + k_slice], byte, dn, preferred_element_type=jnp.float32)
            y += jax.lax.dot_general(
                xc_ref[:, kk:kk + k_slice], hi, dn, preferred_element_type=jnp.float32)
        o_ref[:] = y

    return kernel


def int4_matmul_rm_true(x, w4t, st, *, block_n, k_slice, group):
    """x (.., d) @ dequant(w4t (n, d/2) n-major packed; st (n, G) true
    per-(group, n) scales) -> (.., n)."""
    shape = x.shape
    n, half_d = w4t.shape
    d = half_d * 2
    G = st.shape[1]
    half = group // 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m = max(min(256, m), 8)
    bn = min(block_n, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, bn) * bn
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    if n_pad != n:
        w4t = jnp.pad(w4t, [(0, n_pad - n), (0, 0)])
        st = jnp.pad(st, [(0, n_pad - n), (0, 0)])
    xr = x2.reshape(m_pad, G, group)
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx8 = (-8.0 * jnp.sum(xlo, axis=2)).astype(jnp.float32)  # (m, G)
    xlo = xlo.reshape(m_pad, half_d).astype(jnp.bfloat16)
    xc = xc.reshape(m_pad, half_d)

    out = pl.pallas_call(
        _make_rm_true_kernel(k_slice, half),
        grid=(m_pad // block_m, n_pad // bn),
        in_specs=[
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, half_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, G), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, half_d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, G), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(xlo, xc, sx8, w4t, st)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def rand_tree_rm_true(key, cfg, group=INT4_GROUP):
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wqkv": (d, (h + 2 * kv) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L", "group"))
    def draw(k, din, dout, L, group):
        G = din // group
        w4t = jax.random.randint(k, (L, dout, din // 2), -128, 128, jnp.int32).astype(jnp.int8)
        return {"w4t": w4t, "st": jnp.full((L, dout, G), 0.02 / 4.0, jnp.float32)}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        tree[name] = draw(k, din, dout, L, group)
        jax.block_until_ready(tree[name]["w4t"])
    return tree


def make_chain_rm_true(cfg, block_n, k_slice, group=INT4_GROUP):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def proj(x, w):
        return int4_matmul_rm_true(
            x, w["w4t"], w["st"], block_n=block_n, k_slice=k_slice, group=group
        ).astype(jnp.bfloat16)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                qkv = proj(x, lp["wqkv"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + proj(a, lp["wo"])
                gu = proj(x, lp["wgu"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def _gemv4_stacked_kernel(l_ref, xlo_ref, xc_ref, sx_ref, w_ref, col_ref, o_ref):
    """Rowmajor factored kernel reading the FULL stacked (L, n, d/2) weight
    buffer; the layer is chosen by the scalar-prefetched index in the
    BlockSpec index_map. Inside lax.scan this removes the per-layer
    dynamic-slice COPY that XLA materializes for pallas operands (the
    ~300 GB/s plateau: slice-read + copy-write + kernel-read = 3x traffic;
    raw int8 DMA measures 748 GB/s in tools/perf_pallas_dma.py)."""
    byte = w_ref[0].astype(jnp.float32)  # (bn, d/2)
    hi = jnp.floor(byte * 0.0625)
    dn = (((1,), (1,)), ((), ()))
    y = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    o_ref[:] = (y + sx_ref[:]) * col_ref[:]


def int4_matmul_rm_stacked(x, w4t_all, row, col, layer_idx, *, block_n_override=None):
    """x (.., d) @ dequant(w4t_all (L, n, d/2)[layer_idx]); row (G,), col (n,)
    already sliced for this layer (small)."""
    shape = x.shape
    L, n, half_d = w4t_all.shape
    d = half_d * 2
    G = row.shape[0]
    group = d // G
    half = group // 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, half_d, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    n_pad = _cdiv(n, block_n) * block_n
    assert n_pad == n, "pad n at pack time for the stacked path"
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xr = x2.reshape(m_pad, G, group) * row[None, :, None]
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx = (-8.0 * jnp.sum(xlo, axis=(1, 2)))[:, None]
    xlo = xlo.reshape(m_pad, half_d).astype(jnp.bfloat16)
    xc = xc.reshape(m_pad, half_d)

    out = pl.pallas_call(
        _gemv4_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n_pad // block_n),
            in_specs=[
                pl.BlockSpec((block_m, half_d), lambda i, j, l: (i, 0)),
                pl.BlockSpec((block_m, half_d), lambda i, j, l: (i, 0)),
                pl.BlockSpec((block_m, 1), lambda i, j, l: (i, 0)),
                pl.BlockSpec((1, block_n, half_d), lambda i, j, l: (l[0], j, 0)),
                pl.BlockSpec((1, block_n), lambda i, j, l: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(jnp.asarray([layer_idx], jnp.int32), xlo, xc, sx, w4t_all, col[None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def make_chain_stacked(cfg):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def make_proj(w):  # closure over the FULL stacked buffer (scan constant)
        def proj(x, lidx, row, col):
            return int4_matmul_rm_stacked(
                x, w["w4t"], row, col, lidx
            ).astype(jnp.bfloat16)

        return proj

    @jax.jit
    def chunk(tree, x, rng):
        projs = {k: make_proj(v) for k, v in tree.items()}
        small = {k: {"row": v["row"], "col": v["col"]} for k, v in tree.items()}

        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, xs):
                lidx, sm = xs
                qkv = projs["wqkv"](x, lidx, sm["wqkv"]["row"], sm["wqkv"]["col"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + projs["wo"](a, lidx, sm["wo"]["row"], sm["wo"]["col"])
                gu = projs["wgu"](x, lidx, sm["wgu"]["row"], sm["wgu"]["col"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                x = x + projs["w_down"](g, lidx, sm["w_down"]["row"], sm["w_down"]["col"])
                return x.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(layer, x, (jnp.arange(cfg.num_layers), small))
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def _gemv4_global_kernel(l_ref, xs_ref, w_ref, col_ref, o_ref):
    """v18: GLOBAL-half packing (orig row c pairs with c + d/2, so xlo/xhi
    are contiguous minor slices of x) + in-kernel prep: one prescaled x
    operand instead of xlo/xc/sx buffers + per-call XLA prep fusions."""
    half_d = xs_ref.shape[1] // 2
    xlo = xs_ref[:, :half_d]
    xc = xs_ref[:, half_d:] - 16.0 * xlo
    sx = -8.0 * jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
    byte = w_ref[0].astype(jnp.float32)  # (bn, d/2)
    hi = jnp.floor(byte * 0.0625)
    dn = (((1,), (1,)), ((), ()))
    y = jax.lax.dot_general(xlo, byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc, hi, dn, preferred_element_type=jnp.float32)
    o_ref[:] = (y + sx) * col_ref[:]


def int4_matmul_global(x_rowscaled, w4t_all, col, layer_idx, *, block_n_override=None):
    """x already multiplied by the per-group row scales; w4t_all (L, n, d/2)
    global-half packed n-major."""
    shape = x_rowscaled.shape
    L, n, half_d = w4t_all.shape
    d = half_d * 2
    x2 = x_rowscaled.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, half_d, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    assert n % block_n == 0, "pad n at pack time"
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])

    out = pl.pallas_call(
        _gemv4_global_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n // block_n),
            in_specs=[
                pl.BlockSpec((block_m, d), lambda i, j, l: (i, 0)),
                pl.BlockSpec((1, block_n, half_d), lambda i, j, l: (l[0], j, 0)),
                pl.BlockSpec((1, block_n), lambda i, j, l: (0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(jnp.asarray([layer_idx], jnp.int32), x2.astype(jnp.bfloat16), w4t_all, col[None, :])
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x_rowscaled.dtype)


def pack_global(q, group):
    """q (d, n) int4 values -> (n, d/2) int8, GLOBAL halves, biased lo:
    byte[n, c] = ((q[c, n] + 8) & 0xF) | (q[c + d/2, n] << 4)."""
    d, n = q.shape
    lo, hi = q[: d // 2], q[d // 2:]
    packed = (((lo + 8) & 0x0F) | (hi << 4)).astype(jnp.int8)  # (d/2, n)
    return packed.T


def make_chain_global(cfg):
    d = cfg.hidden_size
    f = cfg.intermediate_size
    G = d // INT4_GROUP

    def make_proj(w):
        def proj(x, lidx, row, col):
            xs = (x.reshape(x.shape[0], -1, INT4_GROUP)
                  * row[None, :, None].astype(x.dtype)).reshape(x.shape)
            return int4_matmul_global(xs, w["w4t"], col, lidx).astype(jnp.bfloat16)

        return proj

    @jax.jit
    def chunk(tree, x, rng):
        projs = {k: make_proj(v) for k, v in tree.items()}
        small = {k: {"row": v["row"], "col": v["col"]} for k, v in tree.items()}

        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, xs):
                lidx, sm = xs
                qkv = projs["wqkv"](x, lidx, sm["wqkv"]["row"], sm["wqkv"]["col"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + projs["wo"](a, lidx, sm["wo"]["row"], sm["wo"]["col"])
                gu = projs["wgu"](x, lidx, sm["wgu"]["row"], sm["wgu"]["col"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                x = x + projs["w_down"](g, lidx, sm["w_down"]["row"], sm["w_down"]["col"])
                return x.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(layer, x, (jnp.arange(cfg.num_layers), small))
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def _gemv4_true3d_kernel(l_ref, xlo_ref, xc_ref, sx8_ref, w_ref, st_ref, o_ref):
    """v19: TRUE per-(group, n) scales with no reshape/repeat: weights blocked
    3D (G, half, bn), scales (G, bn) broadcast over the middle dim (legal),
    dots contract BOTH (G, half) dims."""
    byte = w_ref[0].astype(jnp.float32)  # (G, half, bn)
    hi = jnp.floor(byte * 0.0625)
    s = st_ref[0].astype(jnp.float32)[:, None, :]  # (G, 1, bn)
    byte = byte * s
    hi = hi * s
    dn = (((1, 2), (0, 1)), ((), ()))  # contract (G, half)
    y = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    # correction: -8 * sum_G s[G, n] * sum_i xlo[m, G, i]
    y += jax.lax.dot_general(
        sx8_ref[:], st_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = y


def int4_matmul_true3d(x, w4_all, st_all, layer_idx, *, group=INT4_GROUP,
                       block_n_override=None):
    """x (.., d) @ dequant(w4_all (L, G, half, n)[layer_idx]; st (L, G, n))."""
    shape = x.shape
    L, G, half, n = w4_all.shape
    d = G * half * 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, d // 2, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    assert n % block_n == 0
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xr = x2.reshape(m_pad, G, 2 * half)
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).astype(jnp.bfloat16)
    sx8 = (-8.0 * jnp.sum(xlo, axis=2)).astype(jnp.float32)  # (m, G)
    xlo = xlo.astype(jnp.bfloat16)

    out = pl.pallas_call(
        _gemv4_true3d_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, n // block_n),
            in_specs=[
                pl.BlockSpec((block_m, G, half), lambda i, j, l: (i, 0, 0)),
                pl.BlockSpec((block_m, G, half), lambda i, j, l: (i, 0, 0)),
                pl.BlockSpec((block_m, G), lambda i, j, l: (i, 0)),
                pl.BlockSpec((1, G, half, block_n), lambda i, j, l: (l[0], 0, 0, j)),
                pl.BlockSpec((1, G, block_n), lambda i, j, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
    )(jnp.asarray([layer_idx], jnp.int32), xlo, xc, sx8, w4_all, st_all)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def _gemv4_batched_stacked_kernel(l_ref, xlo_ref, xc_ref, sx8_ref, w_ref, st_ref, o_ref):
    """v20: TRUE per-(group, n) scales via per-group batched dots (scales
    land on the (G, bm, bn) dot outputs — no repeat/multi-contraction) +
    stacked scalar-prefetch weights (no scan-slice copy)."""
    byte = w_ref[0].astype(jnp.bfloat16)  # (G, half, bn)
    hi = (w_ref[0].astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))  # batch G, contract half
    a = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    a += jax.lax.dot_general(xc_ref[:], hi, dn, preferred_element_type=jnp.float32)
    s = st_ref[0]  # (G, bn) f32
    y = jnp.sum(a * s[:, None, :], axis=0)  # (bm, bn)
    y += jax.lax.dot_general(
        sx8_ref[:], s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = y


def int4_matmul_batched_stacked(x, w4_all, st_all, layer_idx, *, block_n_override=None):
    """x (.., d) @ dequant(w4_all (L, G, half, n)[layer_idx]; st (L, G, n))."""
    shape = x.shape
    L, G, half, n = w4_all.shape
    d = G * half * 2
    x2 = x.reshape(-1, d).astype(jnp.float32)
    m = x2.shape[0]
    block_m, block_n = _pick_blocks(m, d // 2, n)
    if block_n_override:
        block_n = min(block_n_override, n)
    m_pad = _cdiv(m, block_m) * block_m
    assert n % block_n == 0
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xr = x2.reshape(m_pad, G, 2 * half)
    xlo = xr[:, :, :half]
    xhi = xr[:, :, half:]
    xc = (xhi - 16.0 * xlo).transpose(1, 0, 2).astype(jnp.bfloat16)  # (G, m, half)
    sx8 = (-8.0 * jnp.sum(xlo, axis=2)).astype(jnp.float32)  # (m, G)
    xlo = xlo.transpose(1, 0, 2).astype(jnp.bfloat16)

    out = pl.pallas_call(
        _gemv4_batched_stacked_kernel,
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
        interpret=jax.devices()[0].platform != "tpu",
    )(jnp.asarray([layer_idx], jnp.int32), xlo, xc, sx8, w4_all, st_all)
    return out[:m, :n].reshape(shape[:-1] + (n,)).astype(x.dtype)


def make_chain_batched_stacked(cfg):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def make_proj(w):
        def proj(x, lidx):
            return int4_matmul_batched_stacked(x, w["w4"], w["st"], lidx).astype(jnp.bfloat16)

        return proj

    @jax.jit
    def chunk(tree, x, rng):
        projs = {k: make_proj(v) for k, v in tree.items()}

        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lidx):
                qkv = projs["wqkv"](x, lidx)
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + projs["wo"](a, lidx)
                gu = projs["wgu"](x, lidx)
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                x = x + projs["w_down"](g, lidx)
                return x.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(layer, x, jnp.arange(cfg.num_layers))
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def rand_tree_true3d(key, cfg, group=INT4_GROUP):
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wqkv": (d, (h + 2 * kv) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L"))
    def draw(k, din, dout, L):
        G = din // INT4_GROUP
        w4 = jax.random.randint(
            k, (L, G, INT4_GROUP // 2, dout), -128, 128, jnp.int32).astype(jnp.int8)
        return {"w4": w4, "st": jnp.full((L, G, dout), 0.02 / 4.0, jnp.float32)}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        tree[name] = draw(k, din, dout, L)
        jax.block_until_ready(tree[name]["w4"])
    return tree


def make_chain_true3d(cfg):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def make_proj(w):
        def proj(x, lidx):
            return int4_matmul_true3d(x, w["w4"], w["st"], lidx).astype(jnp.bfloat16)

        return proj

    @jax.jit
    def chunk(tree, x, rng):
        projs = {k: make_proj(v) for k, v in tree.items()}

        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lidx):
                qkv = projs["wqkv"](x, lidx)
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + projs["wo"](a, lidx)
                gu = projs["wgu"](x, lidx)
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                x = x + projs["w_down"](g, lidx)
                return x.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(layer, x, jnp.arange(cfg.num_layers))
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def rand_tree_rowmajor(key, cfg):
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wqkv": (d, (h + 2 * kv) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L"))
    def draw(k, din, dout, L):
        G = din // INT4_GROUP
        w4t = jax.random.randint(k, (L, dout, din // 2), -128, 128, jnp.int32).astype(jnp.int8)
        return {"w4t": w4t,
                "row": jnp.ones((L, G), jnp.float32),
                "col": jnp.full((L, dout), 0.02 / 4.0, jnp.float32)}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        tree[name] = draw(k, din, dout, L)
        jax.block_until_ready(tree[name]["w4t"])
    return tree


def make_chain_rowmajor(cfg, block_n=None):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def proj(x, w):
        return int4_matmul_rowmajor(
            x, w["w4t"], w["row"], w["col"], block_n_override=block_n
        ).astype(jnp.bfloat16)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                qkv = proj(x, lp["wqkv"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + proj(a, lp["wo"])
                gu = proj(x, lp["wgu"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def rand_tree_factored(key, cfg):
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    h, kv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    shapes = {
        "wqkv": (d, (h + 2 * kv) * hd),
        "wo": (h * hd, d),
        "wgu": (d, 2 * f),
        "w_down": (f, d),
    }
    tree = {}
    keys = jax.random.split(key, len(shapes))

    @functools.partial(jax.jit, static_argnames=("din", "dout", "L"))
    def draw(k, din, dout, L):
        G = din // INT4_GROUP
        w4 = jax.random.randint(k, (L, G, INT4_GROUP // 2, dout), -128, 128, jnp.int32).astype(jnp.int8)
        return {"w4": w4,
                "row": jnp.ones((L, G), jnp.float32),
                "col": jnp.full((L, dout), 0.02 / 4.0, jnp.float32)}

    for k, (name, (din, dout)) in zip(keys, shapes.items()):
        tree[name] = draw(k, din, dout, L)
        jax.block_until_ready(tree[name]["w4"])
    return tree


def make_chain_factored(cfg, block_n=None):
    d = cfg.hidden_size
    f = cfg.intermediate_size

    def proj(x, w):
        return int4_matmul_factored(
            x, w["w4"], w["row"], w["col"], block_n_override=block_n
        ).astype(jnp.bfloat16)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                qkv = proj(x, lp["wqkv"])
                a = qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]
                x = x + proj(a, lp["wo"])
                gu = proj(x, lp["wgu"])
                g = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def make_chain(mode):
    def proj(x, w):
        if mode == "v0_current":
            return int4_matmul(x, w["w4"], w["gscale"]).astype(jnp.bfloat16)
        if mode == "v2_flat":
            return int4_matmul_v2(x, w["w4"], w["gscale"], batched=False).astype(jnp.bfloat16)
        if mode == "v1_batched":
            return int4_matmul_v2(x, w["w4"], w["gscale"], batched=True).astype(jnp.bfloat16)
        if mode == "v3_floorhi":
            return int4_matmul_v2(
                x, w["w4"], w["gscale"], batched=True, hi_mode="floor"
            ).astype(jnp.bfloat16)
        if mode == "v4_i16":
            return int4_matmul_v2(
                x, w["w4"], w["gscale"], batched=True, hi_mode="i16"
            ).astype(jnp.bfloat16)
        if mode == "v5_f32":
            return int4_matmul_v2(
                x, w["w4"], w["gscale"], batched=True, hi_mode="f32"
            ).astype(jnp.bfloat16)
        if mode == "v6_bound":
            return int4_matmul_v2(
                x, w["w4"], w["gscale"], batched=True, hi_mode="bound"
            ).astype(jnp.bfloat16)
        raise ValueError(mode)

    @jax.jit
    def chunk(tree, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                a = proj(x, lp["wq"]) + proj(x, lp["wk"]) + proj(x, lp["wv"])
                x = x + proj(a, lp["wo"])
                g = jax.nn.silu(proj(x, lp["w_gate"])) * proj(x, lp["w_up"])
                return (x + proj(g, lp["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, tree)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(
            0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def correctness_check():
    """Small-shape check on-device: v1/v2 vs explicit dequant matmul."""
    key = jax.random.PRNGKey(7)
    d, n = 512, 384
    kq, kx, ks = jax.random.split(key, 3)
    q = jax.random.randint(kq, (d, n), -8, 8, jnp.int32)
    gs = jax.random.uniform(ks, (d // INT4_GROUP, n), jnp.float32, 0.01, 0.03)
    packed = pack_biased(q, INT4_GROUP)
    x = jax.random.normal(kx, (3, d), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ dequant_biased(packed, gs)
    for name, batched, hi_mode in (
        ("v2_flat", False, "i32"), ("v1_batched", True, "i32"),
        ("v5_f32", True, "f32"),
    ):
        try:
            got = int4_matmul_v2(
                x, packed, gs, batched=batched, hi_mode=hi_mode
            ).astype(jnp.float32)
        except Exception as e:  # legalization failures are data
            print(f"correctness {name} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"correctness {name}: rel err {err:.2e}")
        assert err < 5e-2, (name, err)

    # factored scales: dequant with s = row[G] * col[n]
    row = jax.random.uniform(jax.random.PRNGKey(8), (d // INT4_GROUP,), jnp.float32, 0.5, 2.0)
    col = jax.random.uniform(jax.random.PRNGKey(9), (n,), jnp.float32, 0.01, 0.03)
    ref_f = x.astype(jnp.float32) @ dequant_biased(packed, row[:, None] * col[None, :])
    got_f = int4_matmul_factored(x, packed, row, col).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got_f - ref_f)) / (jnp.max(jnp.abs(ref_f)) + 1e-9))
    print(f"correctness v10_factored: rel err {err:.2e}")
    assert err < 5e-2, ("v10_factored", err)

    packed_t = jnp.transpose(packed, (2, 0, 1)).reshape(n, d // 2)
    got_r = int4_matmul_rowmajor(x, packed_t, row, col).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got_r - ref_f)) / (jnp.max(jnp.abs(ref_f)) + 1e-9))
    print(f"correctness v12_rowmajor: rel err {err:.2e}")
    assert err < 5e-2, ("v12_rowmajor", err)

    got_s = int4_matmul_rm_sliced(
        x, packed_t, row, col, block_n=128, k_slice=128
    ).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got_s - ref_f)) / (jnp.max(jnp.abs(ref_f)) + 1e-9))
    print(f"correctness v14_rm_sliced: rel err {err:.2e}")
    assert err < 5e-2, ("v14_rm_sliced", err)

    try:
        ref_t = x.astype(jnp.float32) @ dequant_biased(packed, gs)
        got_t = int4_matmul_rm_true(
            x, packed_t, gs.T, block_n=128, k_slice=128, group=INT4_GROUP
        ).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got_t - ref_t)) / (jnp.max(jnp.abs(ref_t)) + 1e-9))
        print(f"correctness v16_rm_true: rel err {err:.2e}")
        assert err < 5e-2, ("v16_rm_true", err)
    except Exception as e:  # jnp.repeat reshape does not legalize (Mosaic)
        print(f"correctness v16_rm_true FAILED: {type(e).__name__}: {str(e)[:150]}")

    try:
        stacked = jnp.stack([jnp.zeros_like(packed_t), packed_t])
        got_k = int4_matmul_rm_stacked(x, stacked, row, col, 1).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got_k - ref_f)) / (jnp.max(jnp.abs(ref_f)) + 1e-9))
        print(f"correctness v17_stacked: rel err {err:.2e}")
        assert err < 5e-2, ("v17_stacked", err)
    except Exception as e:
        print(f"correctness v17_stacked FAILED: {type(e).__name__}: {str(e)[:150]}")

    try:
        pg = pack_global(q, INT4_GROUP)  # (n, d/2)
        wd = (q.astype(jnp.float32)
              * jnp.repeat(row, INT4_GROUP)[:, None] * col[None, :])
        ref_g = x.astype(jnp.float32) @ wd
        xs = (x.reshape(x.shape[0], -1, INT4_GROUP) * row[None, :, None].astype(x.dtype)
              ).reshape(x.shape)
        got_g = int4_matmul_global(
            xs, jnp.stack([jnp.zeros_like(pg), pg]), col, 1, block_n_override=128
        ).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got_g - ref_g)) / (jnp.max(jnp.abs(ref_g)) + 1e-9))
        print(f"correctness v18_global: rel err {err:.2e}")
        assert err < 5e-2, ("v18_global", err)
    except Exception as e:
        print(f"correctness v18_global FAILED: {type(e).__name__}: {str(e)[:150]}")

    try:
        ref_t = x.astype(jnp.float32) @ dequant_biased(packed, gs)
        got_3d = int4_matmul_true3d(
            x, jnp.stack([jnp.zeros_like(packed), packed]),
            jnp.stack([jnp.zeros_like(gs), gs]), 1, block_n_override=128,
        ).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got_3d - ref_t)) / (jnp.max(jnp.abs(ref_t)) + 1e-9))
        print(f"correctness v19_true3d: rel err {err:.2e}")
        assert err < 5e-2, ("v19_true3d", err)
    except Exception as e:
        print(f"correctness v19_true3d FAILED: {type(e).__name__}: {str(e)[:150]}")

    try:
        ref_t = x.astype(jnp.float32) @ dequant_biased(packed, gs)
        got_20 = int4_matmul_batched_stacked(
            x, jnp.stack([jnp.zeros_like(packed), packed]),
            jnp.stack([jnp.zeros_like(gs), gs]), 1, block_n_override=128,
        ).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got_20 - ref_t)) / (jnp.max(jnp.abs(ref_t)) + 1e-9))
        print(f"correctness v20_batched_stacked: rel err {err:.2e}")
        assert err < 5e-2, ("v20_batched_stacked", err)
    except Exception as e:
        print(f"correctness v20_batched_stacked FAILED: {type(e).__name__}: {str(e)[:150]}")


def main():
    cfg = get_config("7b").llama
    correctness_check()

    factored = rand_tree_factored(jax.random.PRNGKey(0), cfg)
    rowmajor = rand_tree_rowmajor(jax.random.PRNGKey(0), cfg)
    gb = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(factored)) / 1e9
    print(f"int4 tree: {gb:.1f} GB (x2 variants resident)")

    fns = {}
    trees = {}
    true3d = rand_tree_true3d(jax.random.PRNGKey(0), cfg)
    candidates = [
        ("v18_global", lambda: make_chain_global(cfg), rowmajor),
        ("v20_batched_stk", lambda: make_chain_batched_stacked(cfg), true3d),
    ]
    for name, mk, tr in candidates:
        t0 = time.time()
        try:
            fn = mk()
            x = jnp.ones((1, cfg.hidden_size), jnp.bfloat16)
            jax.device_get(fn(tr, x, jax.random.PRNGKey(1))[1])
        except Exception as e:  # compile failures are data, not fatal
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        fns[name] = fn
        trees[name] = tr
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    reps = {n: [] for n in fns}
    for rep in range(5):
        for name, fn in fns.items():
            x = jnp.ones((1, cfg.hidden_size), jnp.bfloat16) * (1 + rep * 1e-3)
            jax.block_until_ready(x)
            t0 = time.time()
            out = fn(trees[name], x, jax.random.PRNGKey(2 + rep))
            jax.device_get(out[1])
            ms = (time.time() - t0) * 1e3 / K
            reps[name].append(ms)
            print(f"rep{rep} {name:11s} {ms:7.2f} ms/step", flush=True)

    print("\n=== summary (ms/step, median of 5) ===")
    for name, xs in reps.items():
        print(f"{name:11s} {np.median(xs):7.2f}  (min {min(xs):.2f})")


if __name__ == "__main__":
    main()
