"""A/B the int4 DECODE step with the group-batched GEMV kernel vs the
dequant-to-bf16 single-dot kernel (int4_matmul_prefill) at m=B rows.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int4_decode_kernel_ab.py"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models.llama import KVCache, apply_llama
from handsonvlm_tpu.ops import int8_matmul
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

K, S = 16, 1024

def make_chunk(cfg):
    @jax.jit
    def chunk(params, cache, x, rng):
        def body(i, state):
            x, cache, rng, acc = state
            rng, r = jax.random.split(rng)
            hidden, cache = apply_llama(params, cfg, inputs_embeds=x, kv_cache=cache)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, cache, rng, acc + hidden[:, :, :1].sum()
        x, cache, rng, acc = jax.lax.fori_loop(0, K, body, (x, cache, rng, 0.0))
        return x, cache, acc
    return chunk

def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    for b in (1, 8):
        cache0 = KVCache.create(cfg, b, S, jnp.bfloat16)
        cache = KVCache(k=cache0.k, v=cache0.v, index=jnp.asarray(S // 2, jnp.int32))
        for name, min_m in (("dequant-dot", 1), ("gemv", 10**9)):
            int8_matmul.INT4_PREFILL_MIN_M = min_m
            jax.clear_caches()
            fn = make_chunk(cfg)
            x = jax.random.normal(jax.random.PRNGKey(1), (b, 1, cfg.hidden_size), jnp.bfloat16)
            try:
                out = fn(params, cache, x, jax.random.PRNGKey(2))
                np.asarray(jax.device_get(out[2]))
            except Exception as e:
                print(f"B={b} {name}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
                continue
            times = []
            for rep in range(4):
                x = jax.random.normal(jax.random.PRNGKey(3 + rep), (b, 1, cfg.hidden_size), jnp.bfloat16)
                np.asarray(jax.device_get(x[0, 0, :1]))
                t0 = time.time()
                out = fn(params, cache, x, jax.random.PRNGKey(10 + rep))
                np.asarray(jax.device_get(out[2]))
                times.append((time.time() - t0) * 1e3 / K)
            print(f"B={b} {name:12s}: {np.median(times):7.2f} ms/step", flush=True)
        del cache, cache0
if __name__ == "__main__":
    main()
