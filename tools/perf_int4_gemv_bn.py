"""Decode-step A/B over INT4_GEMV_BN (full 7B int4 cached step, K-chained)."""
import os, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models.llama import KVCache, apply_llama
from handsonvlm_tpu.ops import int8_matmul
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

K = 16
def make(cfg):
    @jax.jit
    def chunk(params, cache, x):
        def body(i, state):
            x, cache, acc = state
            hidden, cache = apply_llama(params, cfg, inputs_embeds=x, kv_cache=cache)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, cache, acc + hidden[:, :, :1].sum()
        return jax.lax.fori_loop(0, K, body, (x, cache, 0.0))[2]
    return chunk

def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    cache0 = KVCache.create(cfg, 1, 1024, jnp.bfloat16)
    for bn in (512, 1024, 256):
        int8_matmul.INT4_GEMV_BN = bn
        jax.clear_caches()
        cache = KVCache(k=cache0.k, v=cache0.v, index=jnp.asarray(512, jnp.int32))
        fn = make(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, cfg.hidden_size), jnp.bfloat16)
        try:
            np.asarray(jax.device_get(fn(params, cache, x)))
        except Exception as e:
            print(f"bn={bn}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True); continue
        times = []
        for rep in range(4):
            x = jax.random.normal(jax.random.PRNGKey(2 + rep), (1, 1, cfg.hidden_size), jnp.bfloat16)
            np.asarray(jax.device_get(x[0, 0, :1]))
            t0 = time.time()
            np.asarray(jax.device_get(fn(params, cache, x)))
            times.append((time.time() - t0) * 1e3 / K)
        print(f"bn={bn}: {np.median(times):6.2f} ms/step", flush=True)

if __name__ == "__main__":
    main()
