"""Runtime proof of bf16 B=4 batched decode at 7B (VERDICT #9 follow-up).

The AOT probe (tools/perf_bf16_decode_aot.py) showed the B=4 bf16 OOM is a
pure arg-layout problem: with AUTO input layouts the decode program needs
0.00 GiB of HLO temps, and the prefill program accepts the decode-preferred
param layouts at 0.36 GiB of temps. This script closes the loop at runtime:

1. AOT-compile decode B=4 with AUTO layouts; harvest the preferred formats.
2. jit-init the 7B bf16 params DIRECTLY into those layouts (one program —
   the tunnel allocator never returns freed buffers, CLAUDE.md).
3. Run + time K-chained decode_chunk dispatches with params pinned to the
   harvested layouts (fresh inputs, device_get sync, two-K differencing).

Success = the first bf16 B>1 decode at 7B on this chip (round 1: OOM).
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from jax.experimental.layout import Format, Layout

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.infer.sampler import decode_chunk
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.models.llama import KVCache

B = int(os.environ.get("RT_B", "4"))
S = int(os.environ.get("RT_S", "512"))
CHUNK = int(os.environ.get("RT_CHUNK", "8"))


def main():
    cfg = get_config("7b")
    lcfg = cfg.llama
    fn = decode_chunk.__wrapped__

    def wrapped(params, cache, mask, tok, wp, fin, rng):
        return fn(params, cfg, cache, mask, tok, wp, fin, rng,
                  k=CHUNK, temperature=0.5, top_p=0.9, attn_impl="auto")

    params_sds = jax.eval_shape(
        lambda k: init_handsonvlm(k, cfg), jax.random.PRNGKey(0)
    )
    cache_sds = KVCache(
        k=jax.ShapeDtypeStruct(
            (lcfg.num_layers, B, S, lcfg.kv_heads, lcfg.head_dim_), cfg.pdtype),
        v=jax.ShapeDtypeStruct(
            (lcfg.num_layers, B, S, lcfg.kv_heads, lcfg.head_dim_), cfg.pdtype),
        index=jax.ShapeDtypeStruct((), jnp.int32),
    )
    sds = (
        params_sds, cache_sds,
        jax.ShapeDtypeStruct((B, S), bool),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B, 2, 2), cfg.pdtype),
        jax.ShapeDtypeStruct((B,), bool),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    auto = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), sds)
    t0 = time.time()
    compiled = jax.jit(wrapped, in_shardings=auto).lower(*sds).compile()
    fmts = compiled.input_formats[0]
    m = compiled.memory_analysis()
    print(f"AOT: temp {m.temp_size_in_bytes/2**30:.2f} GiB "
          f"({time.time()-t0:.0f}s)", flush=True)

    # Materialize params straight into the decode-preferred layout.
    t0 = time.time()
    init_fn = jax.jit(lambda k: init_handsonvlm(k, cfg), out_shardings=fmts[0])
    params = init_fn(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"params initialized in pinned layout ({time.time()-t0:.0f}s)",
          flush=True)

    zero_fn = jax.jit(
        lambda: KVCache(
            k=jnp.zeros((lcfg.num_layers, B, S, lcfg.kv_heads, lcfg.head_dim_),
                        cfg.pdtype),
            v=jnp.zeros((lcfg.num_layers, B, S, lcfg.kv_heads, lcfg.head_dim_),
                        cfg.pdtype),
            index=jnp.asarray(64, jnp.int32),
        ),
        out_shardings=fmts[1],
    )
    cache = zero_fn()
    mask = jax.device_put(
        jnp.arange(S)[None, :].repeat(B, 0) < 64, fmts[2])
    wp = jax.device_put(jnp.zeros((B, 2, 2), cfg.pdtype), fmts[4])
    fin = jax.device_put(jnp.zeros((B,), bool), fmts[5])

    # The run function: chain decode chunks, donating the cache.
    run = jax.jit(wrapped, in_shardings=fmts, donate_argnums=(1,))

    def run_k(nk, seed):
        nonlocal cache
        rng = jax.device_put(
            jax.random.PRNGKey(seed).astype(jnp.uint32), fmts[6])
        tok = jax.device_put(
            jnp.full((B,), 100 + seed, jnp.int32), fmts[3])
        t0 = time.time()
        out = None
        c = cache
        for _ in range(nk):
            c, tok2, wp2, fin2, rng2, tokens, wps, hands = run(
                params, c, mask, tok, wp, fin, rng)
            tok, rng = tok2, rng2
        toks = jax.device_get(tokens)
        dt = time.time() - t0
        cache = c
        return dt, toks

    run_k(1, 0)  # warm
    d1, _ = run_k(2, 1)
    d2, toks = run_k(6, 2)
    per_step = (d2 - d1) / ((6 - 2) * CHUNK) * 1e3
    agg = B / ((d2 - d1) / ((6 - 2) * CHUNK))
    print(f"B={B} bf16 decode: {per_step:.2f} ms/step, "
          f"{agg:.1f} tok/s aggregate (sample tokens {toks[0][:4]})",
          flush=True)


if __name__ == "__main__":
    main()
