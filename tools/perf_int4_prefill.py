"""A/B the int4 prefill dispatch: group-batched GEMV kernel (decode form)
vs dequant-to-bf16 full-contraction MXU kernel (int4_matmul_prefill).

Times a K-chained 7B decoder prefill (T=512 into an S=1024 cache) in ONE
jit per variant, fresh inputs + device_get sync (CLAUDE.md timing rules).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int4_prefill.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.llama import KVCache, apply_llama  # noqa: E402
from handsonvlm_tpu.ops import int8_matmul  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4  # noqa: E402

K = 4
T = 512
S = 1024


def make_fn(cfg):
    @jax.jit
    def run(params, x, rng):
        def body(i, state):
            x, acc = state
            cache = KVCache.create(cfg, 1, S, jnp.bfloat16)
            hidden, cache = apply_llama(params, cfg, inputs_embeds=x, kv_cache=cache)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, acc + hidden[:, -1, :1].sum()

        x, acc = jax.lax.fori_loop(0, K, body, (x, 0.0))
        return acc

    return run


def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)

    for name, min_m in (("prefill-mxu", 128), ("gemv-batched", 10**9)):
        int8_matmul.INT4_PREFILL_MIN_M = min_m
        jax.clear_caches()
        fn = make_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.hidden_size), jnp.bfloat16)
        try:
            out = fn(params, x, jax.random.PRNGKey(2))
            np.asarray(jax.device_get(out))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        times = []
        for rep in range(4):
            x = jax.random.normal(jax.random.PRNGKey(3 + rep), (1, T, cfg.hidden_size), jnp.bfloat16)
            np.asarray(jax.device_get(x[0, 0, :1]))
            t0 = time.time()
            out = fn(params, x, jax.random.PRNGKey(10 + rep))
            np.asarray(jax.device_get(out))
            times.append((time.time() - t0) * 1e3 / K)
        print(f"{name}: {np.median(times):7.2f} ms per T={T} prefill", flush=True)


if __name__ == "__main__":
    main()
