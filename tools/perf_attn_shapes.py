"""Flash-vs-XLA attention at the shapes this model actually runs.

After the bf16-operand fix (dots in input dtype, f32 accumulation — the old
kernel ran f32xf32 MXU passes, ~8x slower), re-measure and retune the
dispatch table in ops/attention._best_impl:

  llama prefill: B=1, H=32, D=128, T=S in {512, 1024, 2048}, causal
  CLIP tower:    B=100, H=16, D=64, T=S=257, non-causal
  block sweep:   (128,128) / (256,256) / (256,512)

Interleaved A/B, fresh inputs, device_get sync (CLAUDE.md timing rules).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_attn_shapes.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.ops.attention import attention_xla  # noqa: E402
from handsonvlm_tpu.ops.flash_attention import flash_attention  # noqa: E402

SHAPES = [
    # name, b, t, h, d, causal
    ("llama_T512", 1, 512, 32, 128, True),
    ("llama_T1024", 1, 1024, 32, 128, True),
    ("llama_T2048", 1, 2048, 32, 128, True),
    ("clip_257", 100, 257, 16, 64, False),
]

BLOCKS = [(128, 128), (256, 256), (256, 512)]


def _chained(fn, k_reps):
    """K dependent attention calls in ONE dispatch: the ~30 ms tunnel
    latency cancels in the (K2 - K1) difference."""
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = fn(q, k, v)
            return q + out.astype(q.dtype) * jnp.bfloat16(1e-3)

        return jax.lax.fori_loop(0, k_reps, body, q)

    return run


def bench_fn(fn, qkv, reps=4):
    K1, K2 = 1, 9
    runs = {kk: _chained(fn, kk) for kk in (K1, K2)}
    for r in runs.values():
        jax.block_until_ready(r(*qkv))
    secs = {K1: [], K2: []}
    for rep in range(reps):
        for kk in (K1, K2):
            q, k, v = (x * (1 + rep * 1e-3) for x in qkv)
            np.asarray(jax.device_get(q[:1, :1, 0, 0]))
            t0 = time.time()
            out = runs[kk](q, k, v)
            np.asarray(jax.device_get(out[0, 0, 0, :4]))
            secs[kk].append(time.time() - t0)
    return float(np.median(secs[K2]) - np.median(secs[K1])) * 1e3 / (K2 - K1)


def main():
    key = jax.random.PRNGKey(0)
    for name, b, t, h, d, causal in SHAPES:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
        qkv = (q, k, v)

        fns = {"xla": jax.jit(functools.partial(attention_xla, causal=causal))}
        for bq, bk in BLOCKS:
            if bq > t:
                continue
            fns[f"flash_{bq}x{bk}"] = jax.jit(functools.partial(
                flash_attention, causal=causal, block_q=bq, block_k=bk))

        results = {}
        ref = None
        for fname, fn in fns.items():
            try:
                out = jax.device_get(fn(*qkv))  # compile + numerics
            except Exception as e:
                print(f"{name:12s} {fname:14s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            if fname == "xla":
                ref = np.asarray(out, np.float32)
            elif ref is not None:
                err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                if err > 3e-2:
                    print(f"{name:12s} {fname:14s} NUMERICS max|diff|={err:.3e}", flush=True)
            results[fname] = bench_fn(fn, qkv)
        line = "  ".join(f"{f}={ms:7.2f}" for f, ms in results.items())
        print(f"{name:12s} {line}", flush=True)


if __name__ == "__main__":
    main()
