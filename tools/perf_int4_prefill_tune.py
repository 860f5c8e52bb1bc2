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
    import os
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    # grid: (bm, bn) as before, plus the block_k axis (0 = full-d
    # contraction, the round-2 default) for the MFU push — smaller bk
    # shrinks the VMEM working set (more latitude for bigger bm x bn)
    # at the cost of an f32 accumulator pass per k-step
    grid = [(256, 512, 0), (256, 512, 2048), (256, 512, 1024),
            (512, 512, 2048), (512, 512, 1024), (512, 1024, 1024),
            (512, 256, 0), (128, 512, 0), (256, 256, 0)]
    if os.environ.get("HANDSONVLM_TUNE_GRID"):
        grid = [tuple(int(x) for x in g.split("x"))
                for g in os.environ["HANDSONVLM_TUNE_GRID"].split(",")]
    for bm, bn, bk in grid:
        int8_matmul.PREFILL4_BLOCK_M = bm
        int8_matmul.PREFILL4_BLOCK_N = bn
        int8_matmul.PREFILL4_BLOCK_K = bk
        # label rows with the EFFECTIVE blocks — the VMEM-budget guard in
        # _prefill4_blocks may rewrite a requested config (shedding bk/bm),
        # and a timing must not be attributed to blocks that never ran
        eff_tag = "  eff: " + " ".join(
            f"{name}={'/'.join(map(str, int8_matmul._prefill4_blocks(T, d_in, n_out, 128)))}"
            for name, d_in, n_out in (
                ("up", cfg.hidden_size, cfg.intermediate_size),
                ("down", cfg.intermediate_size, cfg.hidden_size)))
        jax.clear_caches()
        fn = make_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.hidden_size), jnp.bfloat16)
        try:
            np.asarray(jax.device_get(fn(params, x)))
        except Exception as e:
            print(f"bm={bm} bn={bn} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}{eff_tag}", flush=True)
            continue
        times = []
        for rep in range(4):
            x = jax.random.normal(jax.random.PRNGKey(3 + rep), (1, T, cfg.hidden_size), jnp.bfloat16)
            np.asarray(jax.device_get(x[0, 0, :1]))
            t0 = time.time()
            np.asarray(jax.device_get(fn(params, x)))
            times.append((time.time() - t0) * 1e3 / K)
        print(f"bm={bm} bn={bn} bk={bk}: {np.median(times):7.2f} ms per T={T} prefill{eff_tag}", flush=True)

if __name__ == "__main__":
    main()
