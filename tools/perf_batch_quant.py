"""Batched decode throughput for quantized 7B (serving mode).

Methodology matches the int8 B=8 record in docs/PERF_NOTES.md: B concurrent
requests, EK tiled-frame protocol, 64 new tokens, aggregate tok/s INCLUDING
prefill. Weights random, direct quantized init (no bf16 transients).

Usage:
  HANDSONVLM_QUANT=int4 HANDSONVLM_BATCHES=1,4,8 \
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_batch_quant.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer  # noqa: E402
from handsonvlm_tpu.infer.sampler import generate_chunked  # noqa: E402
from handsonvlm_tpu.models.clip_vit import init_clip_vision  # noqa: E402
from handsonvlm_tpu.models.projector import init_projector  # noqa: E402
from handsonvlm_tpu.models.traj_cvae import init_traj_decoder  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4, init_llama_int8  # noqa: E402


def main():
    quant = os.environ.get("HANDSONVLM_QUANT", "int4")
    batches = [int(b) for b in os.environ.get("HANDSONVLM_BATCHES", "1,4,8").split(",")]
    max_new = 64
    cfg = get_config(os.environ.get("HANDSONVLM_PRESET", "7b"))

    init_q = init_llama_int4 if quant == "int4" else init_llama_int8
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    dtype = cfg.pdtype
    params = {
        "llama": init_q(k1, cfg.llama, dtype),
        "vision": jax.jit(lambda k: init_clip_vision(k, cfg.vision, dtype))(k2),
        "projector": jax.jit(
            lambda k: init_projector(k, cfg.mm_hidden_size, cfg.llama.hidden_size, dtype))(k3),
        "traj": jax.jit(
            lambda k: init_traj_decoder(k, cfg.traj, cfg.llama.hidden_size // 2, dtype))(k4),
    }
    jax.block_until_ready(params)
    jax.clear_caches()

    tok = MockTokenizer()
    from handsonvlm_tpu.data.conversation import conv_templates
    from handsonvlm_tpu.data.tokenization import tokenizer_image_token

    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhere should my hand move to open the fridge?")
    conv.append_message(conv.roles[1], None)
    ids1 = np.asarray(tokenizer_image_token(conv.get_prompt(), tok), np.int64)[None]

    rng = np.random.default_rng(0)
    n_unique = min(10, cfg.num_frames)
    reps = cfg.num_frames // n_unique
    frame_map = np.tile(np.arange(n_unique, dtype=np.int32), reps)

    # HANDSONVLM_KV accepts a comma list ("none,int8") for an interleaved
    # same-process A/B — tunnel throughput varies 1.5-2x run to run
    # (CLAUDE.md), so only interleaved comparisons are meaningful. The
    # weight tree is shared; KV caches are per-call transients.
    kv_modes = [
        (None if m in ("", "none", "bf16") else m)
        for m in os.environ.get("HANDSONVLM_KV", "").split(",")
    ] or [None]

    for b in batches:
        ids = jnp.asarray(np.tile(ids1, (b, 1)))
        uframes = rng.normal(
            size=(b, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size))
        images = jnp.asarray(uframes, cfg.cdtype)
        fmap = jnp.asarray(np.tile(frame_map[None], (b, 1)))  # per-row maps

        def run(seed, kv_quant):
            return generate_chunked(
                params, cfg, ids, images, jax.random.PRNGKey(seed),
                max_new_tokens=max_new, temperature=0.5, top_p=0.9,
                chunk=32, frame_map=fmap, kv_quant=kv_quant,
            )

        live = []
        for kv in kv_modes:
            try:
                out = run(0, kv)
                jax.block_until_ready(out.sequences)
                live.append(kv)
            except Exception as e:
                print(f"B={b} kv={kv or 'bf16'} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        n_iters = 3
        stats = {kv: [0, 0.0] for kv in live}  # tokens, seconds
        for i in range(1, n_iters + 1):
            for kv in live:  # interleaved A/B
                t0 = time.perf_counter()
                out = run(i, kv)
                n = int(jax.device_get(out.num_tokens).sum())
                dt = time.perf_counter() - t0
                stats[kv][0] += n
                stats[kv][1] += dt
        for kv in live:
            total, dt = stats[kv]
            print(f"B={b} kv={kv or 'bf16':4s}: {total/dt:7.1f} tok/s aggregate "
                  f"({total/dt/b:6.1f}/req, {total} tokens in {dt:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
