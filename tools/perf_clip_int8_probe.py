"""CLIP encode VERDICT r3 #8 probe: int8 ViT MLP at the exact eval shapes.

Round-3 decomposition (docs/PERF_NOTES.md 'CLIP encode decomposition'):
B=10 encode = 13.34 ms with the vit attention kernel; the written slack is
~4 ms of MLP GEMM inefficiency (9.0 ms vs a 5.0 ms bf16 MXU floor at
m=2570). v5e's int8 MXU peak is 2x bf16 (394 vs 197 T), so a FULL int8
MLP (int8 weights x dynamically-quantized int8 activations, int32
accumulate) has a ~2.5 ms floor — if the measured GEMMs actually reach
int8 rates at these shapes, an int8 CLIP tower clears the <=10 ms/encode
target; if not, this records the probe-backed dead-end with per-variant
bounds.

Shapes: CLIP-L/14 at 224px, B=10 frames -> m = 10*257 = 2570, fc1
(1024 -> 4096) + gelu + fc2 (4096 -> 1024), 24 layers.

Timing: K-chained in one jit, fresh inputs, device_get sync, two-K
differencing (CLAUDE.md tunnel rules).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    tools/perf_clip_int8_probe.py > /tmp/clip_int8.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
if os.environ.get("HANDSONVLM_CPU"):
    jax.config.update("jax_platforms", "cpu")

M = int(os.environ.get("PERF_M", "2570"))
D = int(os.environ.get("PERF_D", "1024"))
F = int(os.environ.get("PERF_F", "4096"))
LAYERS = int(os.environ.get("PERF_LAYERS", "24"))
K_LO, K_HI = 2, 8  # chain repeats (each = LAYERS MLPs)


def quant_rows(x):
    """Per-row dynamic int8: scale = max|row|/127."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-9)),
                  -127, 127).astype(jnp.int8)
    return x8, s


def mlp_bf16(x, w1, b1, w2, b2):
    # both dots strictly bf16 x bf16 (f32 biases/gelu between, like the
    # real tower) — an f32 second GEMM would leave the bf16 MXU path
    h = jax.nn.gelu((x @ w1).astype(jnp.float32) + b1, approximate=False)
    return ((h.astype(jnp.bfloat16) @ w2).astype(jnp.float32)
            + b2).astype(x.dtype)


def mlp_int8(x, w1q, s1, b1, w2q, s2, b2):
    """int8 x int8 -> int32 MXU dots; gelu in bf16 between."""
    x8, xs = quant_rows(x)
    acc = jax.lax.dot_general(
        x8, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    h = acc.astype(jnp.float32) * xs * s1[None, :] + b1
    h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
    h8, hs = quant_rows(h)
    acc2 = jax.lax.dot_general(
        h8, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return (acc2.astype(jnp.float32) * hs * s2[None, :] + b2).astype(x.dtype)


def chain(fn, k):
    @jax.jit
    def run(x, *ws):
        def body(i, xx):
            def layer(j, y):
                return (fn(y, *ws) * jnp.bfloat16(0.999)
                        + y * jnp.bfloat16(1e-3))
            return jax.lax.fori_loop(0, LAYERS, layer, xx)
        return jax.lax.fori_loop(0, k, body, x).sum()

    return run


def time_fn(fn, x, ws):
    times = []
    for rep in range(5):
        xr = x + jnp.bfloat16(rep * 1e-3)
        np.asarray(jax.device_get(xr[0, :1]))
        t0 = time.perf_counter()
        out = fn(xr, *ws)
        np.asarray(jax.device_get(out))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (M, D), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (D, F), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(ks[2], (F, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)
    # per-output-channel weight quant
    s1 = (jnp.max(jnp.abs(w1), axis=0).astype(jnp.float32) / 127.0)
    w1q = jnp.clip(jnp.round(w1.astype(jnp.float32) / s1[None, :]),
                   -127, 127).astype(jnp.int8)
    s2 = (jnp.max(jnp.abs(w2), axis=0).astype(jnp.float32) / 127.0)
    w2q = jnp.clip(jnp.round(w2.astype(jnp.float32) / s2[None, :]),
                   -127, 127).astype(jnp.int8)

    flops = 2 * M * D * F * 2 * LAYERS  # per chain step
    print(f"m={M} d={D} f={F} layers={LAYERS}; "
          f"{flops/1e12:.2f} TFLOP per chain step", flush=True)

    # numeric sanity: one MLP, int8 vs bf16 relative error
    y_b = np.asarray(jax.jit(mlp_bf16)(x, w1, b1, w2, b2), np.float32)
    y_q = np.asarray(jax.jit(mlp_int8)(x, w1q, s1, b1, w2q, s2, b2), np.float32)
    rel = np.abs(y_q - y_b).max() / max(np.abs(y_b).max(), 1e-9)
    cos = float((y_q * y_b).sum()
                / (np.linalg.norm(y_q) * np.linalg.norm(y_b) + 1e-9))
    print(f"int8-vs-bf16 one MLP: max rel {rel:.3e}, cosine {cos:.6f}",
          flush=True)

    for name, fn, ws in (
        ("bf16", mlp_bf16, (w1, b1, w2, b2)),
        ("int8", mlp_int8, (w1q, s1, b1, w2q, s2, b2)),
    ):
        res = {}
        for k in (K_LO, K_HI):
            f = chain(fn, k)
            f(x, *ws)  # compile
            res[k] = time_fn(f, x, ws)
        ms = (res[K_HI] - res[K_LO]) * 1e3 / (K_HI - K_LO)
        eff_peak = 394.0 if name == "int8" else 197.0
        print(f"{name}: {ms:7.2f} ms per {LAYERS}-layer MLP stack "
              f"({flops/ms/1e9:.0f} GFLOP/ms = "
              f"{flops/(ms*1e-3)/1e12/eff_peak*100:.0f}% of {name} peak)",
              flush=True)


if __name__ == "__main__":
    main()
