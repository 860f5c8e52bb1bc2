"""Decompose the 7B int4 prefill: encode_video (CLIP B=10) / splice /
decoder prefill (T=398, int4 MXU kernel) — K-chained in one jit with
fresh-input reinjection, two-K differencing (CLAUDE.md timing rules).

Env: PARTS csv (default all), PRE_K (default 8).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models.clip_vit import init_clip_vision
from handsonvlm_tpu.models.handsonvlm import encode_video, splice_visual_tokens
from handsonvlm_tpu.models.llama import KVCache, apply_llama
from handsonvlm_tpu.models.projector import init_projector
from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

K = int(os.environ.get("PRE_K", "8"))
PARTS = os.environ.get("PARTS", "full,clip,decoder,splice").split(",")


def main():
    cfg = get_config("7b")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    dtype = cfg.pdtype
    params = {
        "llama": init_llama_int4(k1, cfg.llama, dtype),
        "vision": jax.jit(lambda k: init_clip_vision(k, cfg.vision, dtype))(k2),
        "projector": jax.jit(
            lambda k: init_projector(k, cfg.mm_hidden_size, cfg.llama.hidden_size, dtype)
        )(k3),
        "traj": jax.jit(
            lambda k: init_traj_decoder(k, cfg.traj, cfg.llama.hidden_size // 2, dtype)
        )(k4),
    }
    jax.block_until_ready(params)

    ids = np.concatenate([[1], np.arange(3, 43), [-200], [13]])[None, :]
    ids_j = jnp.asarray(ids)
    rng = np.random.default_rng(0)
    uniq = jnp.asarray(rng.normal(size=(1, 10, 3, 224, 224)), cfg.cdtype)
    frame_map = jnp.asarray(np.repeat(np.arange(10), 10), jnp.int32)
    t_prompt = ids.shape[1] + cfg.num_visual_tokens - 1
    max_len = 512

    def part_full(params, images, seed):
        embed_table = params["llama"]["embed"]["weight"]
        text_embeds = embed_table[jnp.where(ids_j < 0, 0, ids_j)]
        vis = encode_video(params, cfg, images, frame_map=frame_map)
        sp = splice_visual_tokens(text_embeds, ids_j, vis.astype(text_embeds.dtype))
        cache = KVCache.create(cfg.llama, 1, max_len, sp.embeds.dtype)
        mask = jnp.concatenate(
            [sp.attn_mask, jnp.ones((1, max_len - t_prompt), bool)], axis=1)
        hidden, cache = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=sp.embeds,
            attn_mask=mask, kv_cache=cache)
        return hidden[:, -1, :8].astype(jnp.float32)

    def part_clip(params, images, seed):
        vis = encode_video(params, cfg, images, frame_map=frame_map)
        return vis[:, 0, :8].astype(jnp.float32)

    def part_decoder(params, images, seed):
        # skip vision: feed a deterministic fake spliced sequence
        base = (images[0, 0, 0, 0, 0] * 0 + seed).astype(jnp.bfloat16)
        x = jnp.zeros((1, t_prompt, cfg.llama.hidden_size), jnp.bfloat16) + base * 1e-6
        cache = KVCache.create(cfg.llama, 1, max_len, jnp.bfloat16)
        mask = jnp.ones((1, max_len), bool)
        hidden, cache = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=x.astype(jnp.bfloat16),
            attn_mask=mask, kv_cache=cache)
        return hidden[:, -1, :8].astype(jnp.float32)

    def part_splice(params, images, seed):
        embed_table = params["llama"]["embed"]["weight"]
        text_embeds = embed_table[jnp.where(ids_j < 0, 0, ids_j)]
        base = (images[0, 0, 0, 0, 0] * 0 + seed).astype(text_embeds.dtype)
        vis = jnp.zeros(
            (1, cfg.num_visual_tokens, cfg.llama.hidden_size), text_embeds.dtype
        ) + base * 1e-6
        sp = splice_visual_tokens(text_embeds, ids_j, vis)
        return sp.embeds[:, -1, :8].astype(jnp.float32)

    parts = {"full": part_full, "clip": part_clip, "decoder": part_decoder,
             "splice": part_splice}

    def chain(fn, params, images, steps, seed):
        def body(carry, i):
            s = seed + carry[0, 0] * jnp.float32(1e-6) + i * jnp.float32(0)
            out = fn(params, images * (1 + s.astype(images.dtype) * 1e-6), s)
            return out, None
        out, _ = jax.lax.scan(body, jnp.zeros((1, 8), jnp.float32),
                              jnp.arange(steps))
        return out

    jits = {n: jax.jit(lambda params, images, steps, seed, n=n: chain(
        parts[n], params, images, steps, seed), static_argnums=2)
        for n in PARTS}

    seed = 0
    for n, fn in jits.items():
        for steps in (1, K + 1):
            np.asarray(jax.device_get(fn(params, uniq, steps, jnp.float32(seed))))
            seed += 1
        print(f"compiled {n}", flush=True)
    best = {}
    for rep in range(3):
        for n, fn in jits.items():
            ts = {}
            for steps in (1, K + 1):
                np.asarray(jax.device_get(fn(params, uniq, 1, jnp.float32(seed)))); seed += 1
                t0 = time.time()
                np.asarray(jax.device_get(fn(params, uniq, steps, jnp.float32(seed))))
                ts[steps] = time.time() - t0
                seed += 1
            per = (ts[K + 1] - ts[1]) / K * 1e3
            best[n] = min(best.get(n, 1e9), per)
            print(f"rep{rep} {n}: {per:.2f} ms", flush=True)
    print("---")
    for n, per in best.items():
        print(f"BEST {n}: {per:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
