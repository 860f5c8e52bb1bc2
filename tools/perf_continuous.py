"""Continuous-batching serving throughput vs sequential (7B, real chip).

Workload: R burst-arriving requests (EK-style prompt, tiled frames, 64 new
tokens, temp 0.5) served by (a) the ContinuousScheduler with S slots over
one shared decode batch, and (b) the production solo path
(generate_chunked) one request at a time. Aggregate tok/s includes prefill
and CLIP encode in both paths. Interleaved rounds (a,b,a,b) — tunnel
throughput varies 1.5-2x run to run, so only same-process interleaved
comparisons are meaningful (CLAUDE.md).

Memory plan (16 GB chip): int4 weights 3.4 GB + int8 KV slot cache at
max_len 6144 ~6.8 GB; bf16 KV at that length would not fit beside the
weights — kv int8 is the continuous default here.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python tools/perf_continuous.py \
    > /tmp/perf_cont.log 2>&1 &
  env: HANDSONVLM_SLOTS=4 HANDSONVLM_REQS=8 HANDSONVLM_CHUNK=16
       HANDSONVLM_MAXLEN=6144 HANDSONVLM_ROUNDS=2 HANDSONVLM_QUANT=int4
"""

from __future__ import annotations

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
if os.environ.get("HANDSONVLM_CPU"):  # CPU smoke (tiny preset)
    jax.config.update("jax_platforms", "cpu")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.data.conversation import conv_templates  # noqa: E402
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer  # noqa: E402
from handsonvlm_tpu.data.tokenization import tokenizer_image_token  # noqa: E402
from handsonvlm_tpu.infer.sampler import generate_chunked  # noqa: E402
from handsonvlm_tpu.models.clip_vit import init_clip_vision  # noqa: E402
from handsonvlm_tpu.models.projector import init_projector  # noqa: E402
from handsonvlm_tpu.models.traj_cvae import init_traj_decoder  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4, init_llama_int8  # noqa: E402
from handsonvlm_tpu.serve.scheduler import ContinuousScheduler  # noqa: E402


def main():
    slots = int(os.environ.get("HANDSONVLM_SLOTS", "4"))
    n_req = int(os.environ.get("HANDSONVLM_REQS", "8"))
    chunk = int(os.environ.get("HANDSONVLM_CHUNK", "16"))
    max_len = int(os.environ.get("HANDSONVLM_MAXLEN", "6144"))
    rounds = int(os.environ.get("HANDSONVLM_ROUNDS", "2"))
    quant = os.environ.get("HANDSONVLM_QUANT", "int4")
    max_new = int(os.environ.get("HANDSONVLM_MAXNEW", "64"))
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

    tok = MockTokenizer()
    conv = conv_templates["v1"].copy()
    conv.append_message(
        conv.roles[0], "<image>\nWhere should my hand move to open the fridge?")
    conv.append_message(conv.roles[1], None)
    ids1 = np.asarray(tokenizer_image_token(conv.get_prompt(), tok), np.int64)[None]

    rng = np.random.default_rng(0)
    n_unique = min(10, cfg.num_frames)
    reps = cfg.num_frames // n_unique
    frame_map = np.tile(np.arange(n_unique, dtype=np.int32), reps)
    uframes = rng.normal(
        size=(1, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size))
    images = jnp.asarray(uframes, cfg.cdtype)
    fmap = jnp.asarray(frame_map)

    # operating-point knobs (VERDICT r4 #5): group width caps how many
    # wave-1 requests share one join dispatch (smaller groups -> earlier
    # first tokens for the group's tail, more join dispatches)
    mjg = int(os.environ.get("HANDSONVLM_MJG", "8"))
    sched = ContinuousScheduler(
        params, cfg, slots=slots, max_len=max_len, chunk=chunk,
        temperature=0.5, top_p=0.9, kv_quant="int8", max_join_group=mjg)

    def run_continuous(seed0):
        """Burst: all requests submitted at t=0; scheduler admits/refills."""
        results = {}
        lat = {}

        def one(i):
            t0 = time.perf_counter()
            out = sched.submit(
                jnp.asarray(ids1), images, seed=seed0 + i, max_new=max_new,
                frame_map=fmap, timeout=3600)
            lat[i] = time.perf_counter() - t0
            results[i] = int(out.num_tokens[0])

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(i,)) for i in range(n_req)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = sum(results.values())
        return total, dt, sorted(lat.values())

    ids_j = jnp.asarray(ids1)
    fmap_b = jnp.asarray(frame_map[None])

    def run_sequential(seed0):
        t0 = time.perf_counter()
        total = 0
        for i in range(n_req):
            out = generate_chunked(
                params, cfg, ids_j, images, jax.random.PRNGKey(seed0 + i),
                max_new_tokens=max_new, temperature=0.5, top_p=0.9,
                chunk=32, frame_map=fmap_b, kv_quant="int8")
            total += int(jax.device_get(out.num_tokens).sum())
        return total, time.perf_counter() - t0

    # warm both paths (compiles; persistent cache makes reruns cheap)
    print("warming continuous path...", flush=True)
    t0 = time.perf_counter()
    n, dt, _ = run_continuous(1000)
    print(f"  warm cont: {n} tokens in {dt:.1f}s (incl. compile, "
          f"{time.perf_counter()-t0:.0f}s wall)", flush=True)
    print("warming sequential path...", flush=True)
    n, dt = run_sequential(2000)
    print(f"  warm seq: {n} tokens in {dt:.1f}s", flush=True)

    for r in range(1, rounds + 1):
        sched.ttfts.clear()
        n, dt, lats = run_continuous(r * 100)
        p50 = lats[len(lats) // 2]
        tt = sorted(sched.ttfts)
        ttft = (f"; TTFT p50 {tt[len(tt) // 2]:.2f}s "
                f"p95 {tt[min(len(tt) - 1, int(len(tt) * 0.95))]:.2f}s "
                f"max {tt[-1]:.2f}s" if tt else "")
        print(f"round {r} continuous  S={slots} chunk={chunk} mjg={mjg}: "
              f"{n/dt:7.1f} tok/s aggregate ({n} tokens in {dt:.1f}s; "
              f"req latency p50 {p50:.1f}s max {lats[-1]:.1f}s{ttft})",
              flush=True)
        n, dt = run_sequential(r * 100 + 50)
        print(f"round {r} sequential           : "
              f"{n/dt:7.1f} tok/s aggregate ({n} tokens in {dt:.1f}s)",
              flush=True)

    sched.stop()


if __name__ == "__main__":
    main()
