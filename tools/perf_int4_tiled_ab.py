"""A/B: flat (L,G,g/2,n) vs tiled (L,NB,G,g/2,BN) int4 GEMV chains.

Hypothesis (docs/PERF_NOTES.md "E2E int4 accounting"): the flat layout's
per-block weight DMA is strided (G*g/2 rows x bn bytes, 512 B rows at 7B)
and runs at ~410 GB/s effective vs 748 GB/s raw contiguous int8; the tiled
layout (ops/int8_matmul.tile_int4_stacked) makes each grid step's weight
block one contiguous ~1 MB read.

Also runs a DMA-floor variant (kernel body reduced to a byte sum) on the
tiled layout to bound what streaming alone costs.

K-chained single-jit timing, fresh inputs, device_get sync (CLAUDE.md).
Weights are jit ARGUMENTS (captured-constant lowering at 3.4 GB adds
minutes of compile per variant).
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.ops.int8_matmul import (
    _gemv4_kernel,
    _int4_matmul_stacked_impl,
    init_llama_int4,
)

K = int(os.environ.get("AB_CHAIN", "16"))


def _stream_tiled_kernel(xlo_ref, xc_ref, sx8_ref, w_ref, s_ref, o_ref):
    byte = w_ref[0, 0].astype(jnp.bfloat16)  # (G, half, BN)
    o_ref[:] = jnp.broadcast_to(
        jnp.sum(byte, axis=(0, 1))[None, :], o_ref.shape
    ).astype(o_ref.dtype)


def _tiled_call(x2, w4t, gst, li, body):
    from handsonvlm_tpu.ops.int8_matmul import (
        _cdiv,
        _pick_blocks_int4,
        _split_x_halves,
    )

    L, NB, G, half, BN = w4t.shape
    m = x2.shape[0]
    block_m, _ = _pick_blocks_int4(m, G, half, BN)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
    xlo, xc, sx8 = _split_x_halves(x2.astype(jnp.float32), G, half * 2)

    def kernel(l_ref, *refs):
        body(*refs)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // block_m, NB),
            in_specs=[
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((G, block_m, half), lambda i, j, l: (0, i, 0)),
                pl.BlockSpec((block_m, G), lambda i, j, l: (i, 0)),
                pl.BlockSpec((1, 1, G, half, BN), lambda i, j, l: (l[0], j, 0, 0, 0)),
                pl.BlockSpec((1, 1, G, BN), lambda i, j, l: (l[0], j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, BN), lambda i, j, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, NB * BN), jnp.float32),
    )(jnp.asarray(li, jnp.int32).reshape(1), xlo, xc, sx8, w4t, gst)
    return out[:m]


def untile(leaf):
    """(L,NB,G,half,BN) -> flat {"w4": (L,G,half,n), "gscale": (L,G,n)}."""
    w4t, gst = leaf["w4t"], leaf["gst"]
    L, NB, G, half, BN = w4t.shape
    w4 = jnp.transpose(w4t, (0, 2, 3, 1, 4)).reshape(L, G, half, NB * BN)
    gs = jnp.transpose(gst, (0, 2, 1, 3)).reshape(L, G, NB * BN)
    return {"w4": w4, "gscale": gs}


def run_chain(cfg, int4, label, mode):
    lcfg = cfg.llama
    d = lcfg.hidden_size

    def matmul(x2, leaf, li):
        if mode == "flat":
            return _int4_matmul_stacked_impl(x2, leaf["w4"], leaf["gscale"], li)
        if mode == "tiled":
            return _int4_matmul_stacked_impl(x2, leaf["w4t"], leaf["gst"], li)
        return _tiled_call(x2, leaf["w4t"], leaf["gst"], li, _stream_tiled_kernel)

    @jax.jit
    def chunk(x, params):
        def step(i, x):
            def layer(li, x):
                q = matmul(x, params["wqkv"], li)
                x1 = q[:, :d] + x * 1e-3
                o = matmul(x1, params["wo"], li)
                gu = matmul(o, params["wgu"], li)
                f = lcfg.intermediate_size
                dn_ = matmul(gu[:, :f] * gu[:, f:] * 1e-3, params["w_down"], li)
                return (x + dn_ * 1e-3).astype(x.dtype)

            return jax.lax.fori_loop(0, lcfg.num_layers, layer, x)

        return jax.lax.fori_loop(0, K, step, x)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, d), jnp.float32)
    np.asarray(jax.device_get(chunk(x0, int4)))
    times = []
    for rep in range(4):
        x = jax.random.normal(jax.random.PRNGKey(2 + rep), (1, d), jnp.float32)
        np.asarray(jax.device_get(x[0, :1]))
        t0 = time.time()
        np.asarray(jax.device_get(chunk(x, int4)))
        times.append((time.time() - t0) * 1e3 / K)
    print(f"{label:14s}: {np.median(times):6.2f} ms/step", flush=True)


def retile(leaf, bn):
    from handsonvlm_tpu.ops.int8_matmul import tile_int4_stacked

    flat = untile(leaf)
    n = flat["w4"].shape[-1]
    while n % bn:
        bn //= 2
    return tile_int4_stacked(flat["w4"], flat["gscale"], block_n=bn)


def main():
    cfg = get_config(os.environ.get("AB_PRESET", "7b"))
    params = init_llama_int4(jax.random.PRNGKey(0), cfg.llama)
    int4_tiled = params["layers"]["int4"]
    jax.block_until_ready(int4_tiled)
    import sys
    modes = sys.argv[1:] or ["tiled", "stream", "flat"]
    for m in modes:
        if m.startswith("bn"):
            bn = int(m[2:])
            t2 = jax.jit(lambda t: {k: retile(v, bn) for k, v in t.items()})(int4_tiled)
            jax.block_until_ready(t2)
            run_chain(cfg, t2, f"tiled-bn{bn}", "tiled")
            run_chain(cfg, t2, f"stream-bn{bn}", "stream")
    if "tiled" in modes:
        run_chain(cfg, int4_tiled, "tiled", "tiled")
    if "stream" in modes:
        run_chain(cfg, int4_tiled, "tiled-stream", "stream")
    if "flat" not in modes:
        return
    int4_flat = jax.jit(
        lambda t: {k: untile(v) for k, v in t.items()}
    )(int4_tiled)
    jax.block_until_ready(int4_flat)
    run_chain(cfg, int4_flat, "flat", "flat")


if __name__ == "__main__":
    main()
