"""Decode per-step cost-floor experiment (ROADMAP: chunked decode shows a
~37 ms/step floor that int8 weights don't move).

Interleaves variants in ONE process on the real chip (tunnel throughput
varies 1.5-2x run-to-run; only same-process A/B is meaningful) and times by
jax.device_get of values derived from fresh inputs (CLAUDE.md timing rules).

Variants (7B bf16, B=1, cache 512, chunk k=16):
  floor        weights-only fori chunk: every decoder weight read once per
               step, no attention/cache/sampling -> the HBM streaming floor
  carry+pallas current generate_chunked path (cache in scan carry, Pallas
               single-query decode attention)
  ys+pallas    cache threaded through scan xs/ys instead of carry
  carry+xla    carry cache, XLA attention
  ys+xla       ys cache, XLA attention

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_decode_floor.py [preset]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.llama import KVCache, apply_llama, init_llama, lm_logits  # noqa: E402

PRESET = sys.argv[1] if len(sys.argv) > 1 else "7b"
K = 16
MAX_LEN = 512
START = 448


def make_chunk(cfg, attn_impl, cache_scan_mode):
    @functools.partial(jax.jit, static_argnames=(), donate_argnums=(1,))
    def chunk(params, cache, tok, rng):
        def body(i, state):
            cache, tok, rng, acc = state
            rng, r = jax.random.split(rng)
            emb = params["embed"]["weight"][tok]
            hidden, cache = apply_llama(
                params, cfg.llama, inputs_embeds=emb[:, None, :],
                kv_cache=cache, attn_impl=attn_impl,
                cache_scan_mode=cache_scan_mode,
            )
            logits = lm_logits(params, cfg.llama, hidden[:, 0:1, :])[:, 0]
            tok = jax.random.categorical(r, logits, axis=-1).astype(jnp.int32)
            return cache, tok, rng, acc + tok
        cache, tok, rng, acc = jax.lax.fori_loop(
            0, K, body, (cache, tok, rng, jnp.zeros_like(tok)))
        return cache, tok, acc

    return chunk


def make_floor(cfg):
    """Touch every decoder weight once per step; no cache, no attention."""
    @jax.jit
    def chunk(params, x, rng):
        L = cfg.llama.num_layers

        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                a = x @ lp["attn"]["wq"] + x @ lp["attn"]["wk"] + x @ lp["attn"]["wv"]
                x = x + a @ lp["attn"]["wo"]
                g = jax.nn.silu(x @ lp["mlp"]["w_gate"]) * (x @ lp["mlp"]["w_up"])
                return x + g @ lp["mlp"]["w_down"], None

            x, _ = jax.lax.scan(layer, x, params["layers"])
            logits = lm_logits(params, cfg.llama, x[:, None, :])[:, 0]
            tok = jax.random.categorical(r, logits, axis=-1)
            x = x + params["embed"]["weight"][tok] * 1e-6  # keep the chain live
            return x, rng, acc + tok.astype(jnp.int32)

        x, rng, acc = jax.lax.fori_loop(0, K, body, (x, rng, jnp.zeros((x.shape[0],), jnp.int32)))
        return x, acc

    return chunk


def main():
    cfg = get_config(PRESET)
    print(f"preset={PRESET} layers={cfg.llama.num_layers} d={cfg.llama.hidden_size}")
    params = jax.jit(lambda k: init_llama(k, cfg.llama, jnp.bfloat16))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    gb = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)) / 1e9
    print(f"llama params: {gb:.1f} GB")

    def fresh_cache():
        c = KVCache.create(cfg.llama, 1, MAX_LEN, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), c.k.shape, jnp.bfloat16) * 0.02
        v = jax.random.normal(jax.random.PRNGKey(2), c.v.shape, jnp.bfloat16) * 0.02
        return KVCache(k=k, v=v, index=jnp.asarray(START, jnp.int32))

    variants = {
        "floor": None,
        "carry+pallas": ("decode", "carry"),
        "ys+pallas": ("decode", "ys"),
        "carry+xla": ("xla", "carry"),
        "ys+xla": ("xla", "ys"),
    }
    fns = {}
    for name, spec in variants.items():
        t0 = time.time()
        if spec is None:
            fn = make_floor(cfg)
            x = jnp.ones((1, cfg.llama.hidden_size), jnp.bfloat16)
            out = fn(params, x, jax.random.PRNGKey(3))
            jax.device_get(out[1])
        else:
            fn = make_chunk(cfg, *spec)
            cache = fresh_cache()
            out = fn(params, cache, jnp.asarray([5], jnp.int32), jax.random.PRNGKey(3))
            jax.device_get(out[2])
        fns[name] = fn
        print(f"compiled {name} in {time.time() - t0:.0f}s", flush=True)

    # interleave reps round-robin so tunnel drift hits all variants equally
    reps = {n: [] for n in fns}
    for rep in range(5):
        for name, fn in fns.items():
            rng = jax.random.PRNGKey(100 + rep)
            if name == "floor":
                x = jnp.ones((1, cfg.llama.hidden_size), jnp.bfloat16) * (1 + rep * 1e-3)
                jax.block_until_ready(x)
                t0 = time.time()
                out = fn(params, x, rng)
                jax.device_get(out[1])
            else:
                cache = fresh_cache()
                tok = jnp.asarray([5 + rep], jnp.int32)
                jax.block_until_ready((cache.k, tok))
                t0 = time.time()
                out = fn(params, cache, tok, rng)
                jax.device_get(out[2])
            ms = (time.time() - t0) * 1e3 / K
            reps[name].append(ms)
            print(f"rep{rep} {name:13s} {ms:7.2f} ms/step", flush=True)

    print("\n=== summary (ms/step, median of 5) ===")
    for name, xs in reps.items():
        print(f"{name:13s} {np.median(xs):7.2f}  (min {min(xs):.2f})")


if __name__ == "__main__":
    main()
