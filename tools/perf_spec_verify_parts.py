"""Decompose the speculative verify forward (t=K+1) cost at 7B int4.

ROADMAP: the t=5 verify forward measures ~1.6x a t=1 step, not the ~1.1x
weight-streaming theory predicts. This probe K-chains each suspect in one
jit (fresh-input carry, device_get sync — CLAUDE.md timing rules) and
differences variants to attribute the gap:

  t1          sequential step: apply_llama(t=1) + lm_logits + argmax
  t5          apply_llama(t=5) + lm_logits(all positions) + argmax
  t5+verify0  + spec_verify greedy (emission arithmetic only)
  t5+verifyS  + spec_verify temp=0.5/top_p=0.9 ((k+1, V) sort + cumsum)
  t5+wps      t5 + vmapped decode_hand_waypoint over k+1 positions
  t5+draft    t5 + ngram_draft over a ~500-token buffer + embed_next_token

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_spec_verify_parts.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.infer.speculative import ngram_draft, spec_verify
from handsonvlm_tpu.models.handsonvlm import decode_hand_waypoint, embed_next_token
from handsonvlm_tpu.models.llama import KVCache, apply_llama, lm_logits
from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

K = int(os.environ.get("PARTS_CHAIN", "16"))
SPEC_K = 4
BUF = 512


def make(cfg, full, variant):
    t = 1 if variant == "t1" else SPEC_K + 1
    lcfg = cfg.llama

    @jax.jit
    def chunk(params, cache, x, buf, rng):
        def body(i, state):
            x, cache, acc, rng = state
            rng, r_v, r_w = jax.random.split(rng, 3)
            if variant == "t5+draft":
                draft, _ = ngram_draft(buf, jnp.asarray(BUF, jnp.int32),
                                       buf[0], buf[1], SPEC_K)
                e0 = embed_next_token(
                    full, cfg, buf[:1], jnp.zeros((1, 2, 2), jnp.float32)
                )
                embs = jnp.concatenate(
                    [e0, params["embed"]["weight"][draft]], axis=0
                )[None].astype(jnp.bfloat16) + x * jnp.bfloat16(1e-3)
            else:
                embs = x
            hidden, cache = apply_llama(params, lcfg, inputs_embeds=embs,
                                        kv_cache=cache)
            logits = lm_logits(params, lcfg, hidden)[0]  # (t, V)
            if variant in ("t5+verify0", "t5+verifyS"):
                temp = 0.0 if variant.endswith("0") else 0.5
                emitted, n_emit = spec_verify(
                    r_v, logits.astype(jnp.float32),
                    jnp.zeros((SPEC_K,), jnp.int32), temp, 0.9, 32100, 2,
                )
                acc = acc + emitted.sum() + n_emit
            else:
                acc = acc + jnp.argmax(logits[-1]).astype(jnp.int32)
            if variant == "t5+wps":
                wps = jax.vmap(
                    lambda h, r: decode_hand_waypoint(full, cfg, h[None], r)[0]
                )(hidden[0], jax.random.split(r_w, t))
                acc = acc + wps.sum().astype(jnp.int32)
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, cache, acc, rng
        return jax.lax.fori_loop(0, K, body, (x, cache, 0, rng))[2]

    return chunk, t


def main():
    cfg = get_config("7b")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = init_llama_int4(k1, cfg.llama)
    full = {
        "llama": params,
        "traj": jax.jit(
            lambda k: init_traj_decoder(
                k, cfg.traj, cfg.llama.hidden_size // 2, cfg.pdtype
            )
        )(k2),
    }
    jax.block_until_ready(full)
    cache0 = KVCache.create(cfg.llama, 1, 1024, jnp.bfloat16)
    buf = jnp.asarray(
        np.random.default_rng(0).integers(3, 30000, size=BUF), jnp.int32
    )
    for variant in ("t1", "t5", "t5+verify0", "t5+verifyS", "t5+wps", "t5+draft"):
        fn, t = make(cfg, full, variant)
        cache = KVCache(k=cache0.k, v=cache0.v, index=jnp.asarray(512, jnp.int32))
        x0 = jax.random.normal(
            jax.random.PRNGKey(1), (1, t, cfg.llama.hidden_size), jnp.bfloat16
        )
        np.asarray(jax.device_get(fn(params, cache, x0, buf, jax.random.PRNGKey(9))))
        times = []
        for rep in range(4):
            x = jax.random.normal(
                jax.random.PRNGKey(2 + rep), (1, t, cfg.llama.hidden_size),
                jnp.bfloat16,
            )
            np.asarray(jax.device_get(x[0, 0, :1]))
            t0 = time.time()
            np.asarray(jax.device_get(
                fn(params, cache, x, buf, jax.random.PRNGKey(10 + rep))
            ))
            times.append((time.time() - t0) * 1e3 / K)
        print(f"{variant:12s}: {np.median(times):6.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
