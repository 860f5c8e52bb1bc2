"""Where do the int4 GEMV chain's 8.3 ms/step go — DMA or VPU unpack?

The 7B int4 decode chain streams ~3.4 GB of packed nibbles at an effective
~410 GB/s, vs 748 GB/s raw int8 DMA (tools/perf_pallas_dma.py). This probe
runs the SAME grid/blocks as _gemv4_kernel with the kernel body cut down:

  full      production kernel (unpack hi, two batched dots, scales)
  one-dot   xlo @ byte only (no hi extraction, no second dot)
  stream    o[:] accumulates byte.astype(bf16).sum() (pure DMA + trivial VPU)

K-chained single-jit timing over the 7-projection x L chain, fresh-input
carry, device_get sync (CLAUDE.md rules).
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
    _pick_blocks_int4,
    _split_x_halves,
    init_llama_int4,
)

K = int(os.environ.get("PARTS_CHAIN", "16"))


def _one_dot_kernel(xlo_ref, xc_ref, sx8_ref, w_ref, s_ref, o_ref):
    byte = w_ref[...].reshape(w_ref.shape[-3:]).astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    a = jax.lax.dot_general(xlo_ref[:], byte, dn, preferred_element_type=jnp.float32)
    s = s_ref[...].reshape(s_ref.shape[-2:])
    o_ref[:] = jnp.sum(a * s[:, None, :], axis=0)


def _stream_kernel(xlo_ref, xc_ref, sx8_ref, w_ref, s_ref, o_ref):
    byte = w_ref[...].reshape(w_ref.shape[-3:]).astype(jnp.bfloat16)
    o_ref[:] = jnp.sum(byte, axis=(0, 1))[None, :] + sx8_ref[0, 0]


def run_chain(cfg, params, body, label):
    lcfg = cfg.llama
    int4 = params["layers"]["int4"]
    d = lcfg.hidden_size

    def matmul(x2, leaf, li):
        w4_all, gs_all = leaf["w4"], leaf["gscale"]
        L, G, half, n = w4_all.shape
        m = x2.shape[0]
        block_m, block_n = _pick_blocks_int4(m, G, half, n)
        m_pad = -(-m // block_m) * block_m
        if m_pad != m:
            x2 = jnp.pad(x2, [(0, m_pad - m), (0, 0)])
        xlo, xc, sx8 = _split_x_halves(x2.astype(jnp.float32), G, half * 2)

        def kernel(l_ref, *refs):
            body(*refs)

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
        )(jnp.asarray(li, jnp.int32).reshape(1), xlo, xc, sx8, w4_all, gs_all)
        return out[:m]

    @jax.jit
    def chunk(x):
        def step(i, x):
            def layer(li, x):
                q = matmul(x, int4["wqkv"], li)
                x1 = q[:, :d] + x * 1e-3
                o = matmul(x1, int4["wo"], li)
                gu = matmul(o, int4["wgu"], li)
                f = lcfg.intermediate_size
                dn_ = matmul(gu[:, :f] * gu[:, f:] * 1e-3, int4["w_down"], li)
                return (x + dn_ * 1e-3).astype(x.dtype)
            return jax.lax.fori_loop(0, lcfg.num_layers, layer, x)
        return jax.lax.fori_loop(0, K, step, x)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, d), jnp.float32)
    np.asarray(jax.device_get(chunk(x0)))
    times = []
    for rep in range(4):
        x = jax.random.normal(jax.random.PRNGKey(2 + rep), (1, d), jnp.float32)
        np.asarray(jax.device_get(x[0, :1]))
        t0 = time.time()
        np.asarray(jax.device_get(chunk(x)))
        times.append((time.time() - t0) * 1e3 / K)
    print(f"{label:8s}: {np.median(times):6.2f} ms/step", flush=True)


def main():
    cfg = get_config("7b")
    params = init_llama_int4(jax.random.PRNGKey(0), cfg.llama)
    jax.block_until_ready(params)
    for body, label in (
        (_gemv4_kernel, "full"),
        (_one_dot_kernel, "one-dot"),
        (_stream_kernel, "stream"),
    ):
        run_chain(cfg, params, body, label)


if __name__ == "__main__":
    main()
