"""Decompose the batched decode step: why is B=8 ~32 ms/step when weights
stream in ~8 ms (int4) and the cache adds ~3.5 GB?

Grid: attn_impl {decode-kernel, xla} x cache length {832, 256} x B {1, 8},
K-step fori chunks, fresh inputs, device_get sync. If time tracks cache
length strongly at B=8 but not B=1, the decode path pays per-layer cache
COPIES at batch (scan-sliced pallas operands / failed aliasing).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_batch_step.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.llama import KVCache, apply_llama  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4  # noqa: E402

K = 16


def make_chunk(cfg, attn_impl, mode="carry"):
    @jax.jit
    def chunk(params, cache, x, rng):
        def body(i, state):
            x, cache, rng, acc = state
            rng, r = jax.random.split(rng)
            hidden, cache = apply_llama(
                params, cfg, inputs_embeds=x, kv_cache=cache, attn_impl=attn_impl,
                cache_scan_mode=mode,
            )
            # re-inject so each step depends on the last (no elision); keep
            # the cache index fixed-ish by rebuilding index (wraps harmless)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, cache, rng, acc + hidden[:, :, :1].sum()

        x, cache, rng, acc = jax.lax.fori_loop(0, K, body, (x, cache, rng, 0.0))
        return x, cache, acc

    return chunk


def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    jax.clear_caches()

    for b in (1, 8):
        for s_max in (1024, 256):
            cache = KVCache.create(cfg, b, s_max, jnp.bfloat16)
            cache = KVCache(k=cache.k, v=cache.v,
                            index=jnp.asarray(s_max // 2, jnp.int32))
            for mode, impl in (("stacked", "auto"), ("stacked", "xla"),
                               ("carry", "auto")):
                fn = make_chunk(cfg, impl, mode)
                x = jax.random.normal(jax.random.PRNGKey(1), (b, 1, cfg.hidden_size), jnp.bfloat16)
                try:
                    out = fn(params, cache, x, jax.random.PRNGKey(2))
                    np.asarray(jax.device_get(out[2]))
                except Exception as e:
                    print(f"B={b} S={s_max} {mode}/{impl}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
                    continue
                times = []
                for rep in range(4):
                    x = jax.random.normal(jax.random.PRNGKey(3 + rep), (b, 1, cfg.hidden_size), jnp.bfloat16)
                    np.asarray(jax.device_get(x[0, 0, :1]))
                    t0 = time.time()
                    out = fn(params, cache, x, jax.random.PRNGKey(10 + rep))
                    np.asarray(jax.device_get(out[2]))
                    times.append((time.time() - t0) * 1e3 / K)
                print(f"B={b} S={s_max} {mode}/{impl:5s}: {np.median(times):7.2f} ms/step", flush=True)
            del cache


if __name__ == "__main__":
    main()
