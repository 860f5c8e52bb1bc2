"""Decode-gap experiment: the cost between the bare decode step (~21 ms at
7B, tools/perf_decode_floor.py) and the full generate_chunked pipeline
(~37 ms/step in bench.py). Adds the real pipeline's pieces one at a time.

Variants (7B bf16, B=1, chunk k=16, cache 832 like the eval bench):
  base        simplified chunk: embed gather + decoder + greedy-categorical
  +topp       base with the HF temperature/top-p warp (full-vocab sort)
  +waypoint   +topp plus the CVAE waypoint decode each step
  +embed      +waypoint plus embed_next_token (hand-coord embedding hook)
  real16      the actual infer.sampler.decode_chunk, k=16
  real64      the actual infer.sampler.decode_chunk, k=64

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_decode_gap.py
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
from handsonvlm_tpu.models.handsonvlm import (  # noqa: E402
    decode_hand_waypoint,
    embed_next_token,
    init_handsonvlm,
)
from handsonvlm_tpu.models.llama import KVCache, apply_llama, lm_logits  # noqa: E402
from handsonvlm_tpu.infer.sampler import _sample_token, decode_chunk  # noqa: E402

PRESET = sys.argv[1] if len(sys.argv) > 1 else "7b"
MAX_LEN = 832  # eval bench: 396 text + 355 visual + 64 new + slack
START = 752


def make_chunk(cfg, mode, k=16):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk(params, cache, tok, wp, rng):
        def body(i, state):
            cache, tok, wp, rng, acc = state
            rng, r = jax.random.split(rng)
            r_tok, r_hand = jax.random.split(r)
            if mode == "+embed":
                emb = embed_next_token(params, cfg, tok, wp)
            else:
                emb = params["llama"]["embed"]["weight"][tok]
            hidden, cache = apply_llama(
                params["llama"], cfg.llama, inputs_embeds=emb[:, None, :],
                kv_cache=cache, attn_impl="auto",
            )
            h = hidden[:, 0, :]
            logits = lm_logits(params["llama"], cfg.llama, h[:, None, :])[:, 0]
            if mode == "base":
                tok = jax.random.categorical(r_tok, logits, axis=-1).astype(jnp.int32)
            else:
                tok = _sample_token(r_tok, logits, 0.5, 0.9)
            if mode in ("+waypoint", "+embed"):
                wp = decode_hand_waypoint(params, cfg, h, r_hand)
            return cache, tok, wp, rng, acc + tok
        cache, tok, wp, rng, acc = jax.lax.fori_loop(
            0, k, body, (cache, tok, wp, rng, jnp.zeros_like(tok)))
        return cache, tok, acc

    return chunk


def main():
    cfg = get_config(PRESET)
    params = jax.jit(lambda key: init_handsonvlm(key, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    def fresh_cache():
        c = KVCache.create(cfg.llama, 1, MAX_LEN, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), c.k.shape, jnp.bfloat16) * 0.02
        v = jax.random.normal(jax.random.PRNGKey(2), c.v.shape, jnp.bfloat16) * 0.02
        return KVCache(k=k, v=v, index=jnp.asarray(START, jnp.int32))

    cache_mask = jnp.ones((1, MAX_LEN), bool)
    # waypoint carry dtype must match decode_hand_waypoint's output (the
    # model compute dtype), or the fori carry types diverge
    wp0 = jnp.zeros((1, 2, 2), cfg.cdtype)
    fin0 = jnp.zeros((1,), bool)

    def run_real(k, rep):
        cache = fresh_cache()
        tok = jnp.asarray([5 + rep], jnp.int32)
        jax.block_until_ready((cache.k, tok))
        t0 = time.time()
        out = decode_chunk(
            params, cfg, cache, cache_mask, tok, wp0, fin0,
            jax.random.PRNGKey(100 + rep), k=k, temperature=0.5, top_p=0.9,
        )
        jax.device_get(out[5])
        return (time.time() - t0) * 1e3 / k

    fns = {m: make_chunk(cfg, m) for m in ("base", "+topp", "+waypoint", "+embed")}

    def run_simple(name, rep):
        fn = fns[name]
        cache = fresh_cache()
        tok = jnp.asarray([5 + rep], jnp.int32)
        jax.block_until_ready((cache.k, tok))
        t0 = time.time()
        out = fn(params, cache, tok, wp0, jax.random.PRNGKey(100 + rep))
        jax.device_get(out[2])
        return (time.time() - t0) * 1e3 / 16

    variants = [("base", lambda r: run_simple("base", r)),
                ("+topp", lambda r: run_simple("+topp", r)),
                ("+waypoint", lambda r: run_simple("+waypoint", r)),
                ("+embed", lambda r: run_simple("+embed", r)),
                ("real16", lambda r: run_real(16, r)),
                ("real64", lambda r: run_real(64, r))]
    for name, fn in variants:
        t0 = time.time()
        fn(0)  # compile
        print(f"compiled {name} in {time.time() - t0:.0f}s", flush=True)

    reps = {n: [] for n, _ in variants}
    for rep in range(1, 6):
        for name, fn in variants:
            ms = fn(rep)
            reps[name].append(ms)
            print(f"rep{rep} {name:10s} {ms:7.2f} ms/step", flush=True)

    print("\n=== summary (ms/step, median of 5) ===")
    for name, xs in reps.items():
        print(f"{name:10s} {np.median(xs):7.2f}  (min {min(xs):.2f})")


if __name__ == "__main__":
    main()
