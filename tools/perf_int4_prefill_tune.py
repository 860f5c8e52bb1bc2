"""Block-size grid for the int4 prefill MXU kernel (full 7B forward A/B).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int4_prefill_tune.py"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models.llama import KVCache, apply_llama
from handsonvlm_tpu.ops import int8_matmul
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

K, T, S = 4, 512, 1024

def make_fn(cfg):
    @jax.jit
    def run(params, x):
        def body(i, state):
            x, acc = state
            cache = KVCache.create(cfg, 1, S, jnp.bfloat16)
            hidden, _ = apply_llama(params, cfg, inputs_embeds=x, kv_cache=cache)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, acc + hidden[:, -1, :1].sum()
        return jax.lax.fori_loop(0, K, body, (x, 0.0))[1]
    return run

def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    for bm, bn in ((256, 512), (512, 256), (128, 512), (256, 256)):
        int8_matmul.PREFILL4_BLOCK_M = bm
        int8_matmul.PREFILL4_BLOCK_N = bn
        jax.clear_caches()
        fn = make_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.hidden_size), jnp.bfloat16)
        try:
            np.asarray(jax.device_get(fn(params, x)))
        except Exception as e:
            print(f"bm={bm} bn={bn}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        times = []
        for rep in range(4):
            x = jax.random.normal(jax.random.PRNGKey(3 + rep), (1, T, cfg.hidden_size), jnp.bfloat16)
            np.asarray(jax.device_get(x[0, 0, :1]))
            t0 = time.time()
            np.asarray(jax.device_get(fn(params, x)))
            times.append((time.time() - t0) * 1e3 / K)
        print(f"bm={bm} bn={bn}: {np.median(times):7.2f} ms per T={T} prefill", flush=True)

if __name__ == "__main__":
    main()
