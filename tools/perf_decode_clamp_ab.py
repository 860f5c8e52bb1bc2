"""A/B: per-row compacted cache-block sweep vs full-cursor sweep (7B, chip).

VERDICT #2 done-criterion: at a continuous-batching cursor >= 4096 with B=4,
decode-step time must track each row's VALID bytes, not the swept allocation.

Setup mirrors the continuous engine's steady state (serve/continuous.py): one
shared cursor at `CURSOR`, each row's valid keys confined to its own prompt
bucket plus the shared decode chunks — the other rows' buckets are masked
holes. Before the compacted block table (ops/decode_attention._stacked_call),
every row DMA'd blocks 0..cursor (~4.3 GB/step of cache reads at cursor 4096,
B=4, int8 KV); with it, DMA tracks the ~25% that is valid.

Three mask variants, same cursor, same cache allocation:
  full : every row valid on [0, cursor)            — the old sweep's cost
  frag : row r valid only on its bucket + chunks   — continuous steady state
  solo : like frag but rows share ONE bucket        — lower bound sanity

Timing per CLAUDE.md: K-chained steps in ONE jit, fresh inputs, device_get
sync, differenced across two K values to cancel tunnel latency. Parity: one
frag-mask decode step vs the XLA attention path, max |diff| printed.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    tools/perf_decode_clamp_ab.py > /tmp/perf_clamp.log 2>&1 &
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

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.llama import QuantKVCache, apply_llama  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4  # noqa: E402

# S=5120 (not 6144): the chunk program's carry cache cannot be donated (the
# host reuses the same cache across reps), so input + updated copy coexist —
# 2 x 5.0 GiB + 3.4 GiB int4 weights fits, 2 x 6 GiB does not (measured OOM)
B = int(os.environ.get("HANDSONVLM_B", "4"))
S = int(os.environ.get("HANDSONVLM_S", "5120"))
CURSOR = int(os.environ.get("HANDSONVLM_CURSOR", "4096"))
BUCKET = CURSOR // B  # per-row prompt bucket in the frag scenario


def make_chunk(cfg, k_steps):
    @jax.jit
    def chunk(params, cache, mask, starts, x):
        def body(i, state):
            x, cache, acc = state
            positions = (cache.index - starts)[:, None]
            hidden, cache = apply_llama(
                params, cfg, inputs_embeds=x, attn_mask=mask,
                positions=positions, kv_cache=cache, attn_impl="auto",
            )
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, cache, acc + hidden[:, :, :1].sum()

        x, cache, acc = jax.lax.fori_loop(0, k_steps, body, (x, cache, 0.0))
        return acc

    return chunk


def build_cache(cfg, rng):
    lc = cfg
    shape = (lc.num_layers, B, S, lc.kv_heads, lc.head_dim_)
    k8 = jax.jit(lambda r: jax.random.randint(r, shape, -127, 128, jnp.int8))(rng)
    v8 = jax.jit(lambda r: jax.random.randint(r, shape, -127, 128, jnp.int8))(
        jax.random.fold_in(rng, 1))
    sc = jnp.full((lc.num_layers, B, lc.kv_heads, S), 0.02, jnp.float32)
    return QuantKVCache(k=k8, v=v8, ks=sc, vs=sc,
                        index=jnp.asarray(CURSOR, jnp.int32))


def masks():
    full = np.zeros((B, S), bool)
    full[:, :CURSOR] = True
    frag = np.zeros((B, S), bool)
    for r in range(B):
        frag[r, r * BUCKET:(r + 1) * BUCKET] = True  # own bucket only
    solo = np.zeros((B, S), bool)
    solo[:, :BUCKET] = True  # all rows share one bucket's span
    return {"full": full, "frag": frag, "solo": solo}


def main():
    cfg = get_config(os.environ.get("HANDSONVLM_PRESET", "7b")).llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    cache = build_cache(cfg, jax.random.PRNGKey(1))
    jax.block_until_ready(cache.k)
    starts = jnp.zeros((B,), jnp.int32)

    kv_bytes_layer = B * S * cfg.kv_heads * cfg.head_dim_ * 2  # k+v int8
    print(f"B={B} S={S} cursor={CURSOR} bucket={BUCKET} "
          f"cache={cfg.num_layers * kv_bytes_layer / 2**30:.1f} GiB", flush=True)

    # --- parity: one frag-mask step, kernel vs xla ---------------------------
    m = masks()["frag"].copy()
    m[:, CURSOR] = True  # the step's own write position
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, cfg.hidden_size),
                          jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("impl",))
    def one(params, cache, mask, x, impl: str):
        return apply_llama(params, cfg, inputs_embeds=x, attn_mask=mask,
                           positions=(cache.index - starts)[:, None],
                           kv_cache=cache, attn_impl=impl)[0]

    h_kern = jax.device_get(one(params, cache, jnp.asarray(m), x, "auto"))
    h_xla = jax.device_get(one(params, cache, jnp.asarray(m), x, "xla"))
    diff = np.abs(h_kern.astype(np.float32) - h_xla.astype(np.float32)).max()
    rel = diff / max(np.abs(h_xla).max(), 1e-9)
    print(f"parity frag-mask kernel vs xla: max|diff|={diff:.3e} rel={rel:.3e}",
          flush=True)

    # --- timing: differenced K-chained steps ---------------------------------
    k_lo, k_hi = 8, 32
    for name, mask in masks().items():
        mk = mask.copy()
        mk[:, CURSOR:CURSOR + k_hi] = True  # the chunk's write span
        mask_j = jnp.asarray(mk)
        res = {}
        for k_steps in (k_lo, k_hi):
            fn = make_chunk(cfg, k_steps)
            fn(params, cache, mask_j, starts, x)  # compile
            times = []
            for rep in range(5):
                xr = jax.random.normal(jax.random.PRNGKey(10 + rep),
                                       (B, 1, cfg.hidden_size), jnp.bfloat16)
                np.asarray(jax.device_get(xr[0, 0, :1]))
                t0 = time.perf_counter()
                out = fn(params, cache, mask_j, starts, xr)
                np.asarray(jax.device_get(out))
                times.append(time.perf_counter() - t0)
            res[k_steps] = float(np.median(times))
        ms = (res[k_hi] - res[k_lo]) * 1e3 / (k_hi - k_lo)
        valid = mask.sum() / B
        gb = (valid * B * cfg.kv_heads * cfg.head_dim_ * 2
              * cfg.num_layers) / 2**30
        print(f"{name:5s}: {ms:7.2f} ms/step  (valid/row={int(valid)}, "
              f"cache-read if clamped ~{gb:.2f} GiB/step)", flush=True)


if __name__ == "__main__":
    main()
