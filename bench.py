"""Headline benchmark: HandsOnVLM-7B decode throughput (tokens/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

`value` is the KV-cached decode throughput of this framework's sampler
(prefill 100-frame video + eval prompt, then autoregressive decode with the
hand-trajectory hook, temperature 0.5 / top-p 0.9 — the EK100 eval protocol,
handsonvlm_inference.py:83-109).

`vs_baseline` compares against the *reference algorithm on the same chip*:
HandsOnVLM decodes with use_cache=False, re-encoding the 100 frames and the
full prefix every token (handsonvlm.py sample() + prepare_inputs_for_
generation, is_evaluate=True). We time one full-prefix forward at
mid-decode length — exactly the reference's per-token cost — so the ratio
is the algorithmic speedup at equal hardware and weights.

At real-model presets (7b/13b) the run is a small orchestration: the
HEADLINE mode (int4 sequential sampling at the EK100 eval protocol
temperature — the parity workload) plus secondary modes (speculative at
the protocol temperature, speculative greedy with the template bank —
the production low-latency serving mode; n-gram acceptance needs real
weights to show up under sampling, see docs/PERF_NOTES.md — plus int8,
bf16, and the 7B QLoRA train step) each run in their OWN subprocess. One
process per mode is load-bearing on this backend: freed device buffers
never return to the allocator within a process (CLAUDE.md), so coexisting
bf16+int4 7B trees would OOM; process exit is the only reliable free.
Secondary modes land in the "modes" field of the single JSON line.

Env:
  HANDSONVLM_BENCH_PRESET = 7b (default) | 13b | 1b | graft
  HANDSONVLM_BENCH_MODES = seq,spec,spec_greedy,kv8,spec_kv8,int8,bf16,train
                           (default; first is headline)
  HANDSONVLM_BENCH_PROBE_TIMEOUT / _PROBE_WALL = per-probe timeout (300) /
                           total retry budget (2400) before declaring the
                           backend down (outage artifact keeps last-good
                           local context)
  HANDSONVLM_BENCH_QUANT = int4 (default: the production serving mode)
                           | int8 | "" (bf16)   [single-process modes]
  HANDSONVLM_BENCH_NEW_TOKENS = 64
  HANDSONVLM_BENCH_SPEC = K>0 enables n-gram speculative decoding with the
                          EK template bank (infer/speculative.py)
  HANDSONVLM_BENCH_TEMP = sampling temperature (default 0.5 = eval
                          protocol; <=0 greedy, metric suffixed _greedy)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _build_config(preset: str):
    from handsonvlm_tpu.core.config import (
        HandsOnVLMConfig,
        LlamaConfig,
        get_config,
    )

    if preset in ("7b", "13b"):
        return get_config(preset)
    if preset == "1b":
        return get_config(
            "7b",
            llama=LlamaConfig(
                hidden_size=2048, intermediate_size=5504, num_layers=16, num_heads=16
            ),
        )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__

    return __graft_entry__._config("graft")


def _eval_prompt(tokenizer, cfg):
    """Render an EK100-eval-style prompt (vanilla protocol)."""
    from handsonvlm_tpu.data.conversation import conv_templates
    from handsonvlm_tpu.data.tokenization import (
        build_conversation_prompt,
        tokenizer_image_token,
    )

    source = [
        {
            "from": "human",
            "value": "<image>\nWhere should my hand move to if I want to open the fridge?",
        },
        {"from": "gpt", "value": None},
    ]
    conv = conv_templates["v1"].copy()
    conv.append_message(conv.roles[0], source[0]["value"])
    conv.append_message(conv.roles[1], None)
    return tokenizer_image_token(conv.get_prompt(), tokenizer)


def run_single():
    t_start = time.time()
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")
    max_new = int(os.environ.get("HANDSONVLM_BENCH_NEW_TOKENS", "64"))
    temp = float(os.environ.get("HANDSONVLM_BENCH_TEMP", "0.5"))
    kv_quant = os.environ.get("HANDSONVLM_BENCH_KV") or None
    skip_baseline = os.environ.get("HANDSONVLM_BENCH_NOBASE", "0") == "1"

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat runs skip the multi-minute 7B
    # compiles (harmless if the backend ignores it)
    try:
        cache_dir = os.environ.get(
            "HANDSONVLM_JAX_CACHE", os.path.expanduser("~/.cache/handsonvlm_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.infer.sampler import generate_chunked
    from handsonvlm_tpu.models.handsonvlm import forward, init_handsonvlm
    from handsonvlm_tpu.models.llama import apply_llama, lm_logits
    from handsonvlm_tpu.models.handsonvlm import encode_video, splice_visual_tokens

    cfg = _build_config(preset)
    dev = jax.devices()[0]
    platform = dev.platform

    # jitted init: one program, bf16 buffers materialized directly (unjitted
    # init leaves fp32 temporaries that fragment HBM at 7B). Int8 quantizes
    # inside the same program so the bf16 decoder weights never persist.
    quant = os.environ.get("HANDSONVLM_BENCH_QUANT", "int4")
    use_int8 = os.environ.get("HANDSONVLM_BENCH_INT8", "0") == "1" or quant == "int8"
    use_int4 = quant == "int4"

    if use_int8 or use_int4:
        # piecewise init+quantize: the fused one-jit version peaks at
        # bf16_tree + int8_tree (19 GB at 13B) and poisons the heap even
        # when it "succeeds" — docs/PERF_NOTES.md 13B section
        from handsonvlm_tpu.models.clip_vit import init_clip_vision
        from handsonvlm_tpu.models.projector import init_projector
        from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
        from handsonvlm_tpu.ops.int8_matmul import init_llama_int4, init_llama_int8

        init_quant_llama = init_llama_int4 if use_int4 else init_llama_int8
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        dtype = cfg.pdtype
        params = {
            "llama": init_quant_llama(k1, cfg.llama, dtype),
            "vision": jax.jit(lambda k: init_clip_vision(k, cfg.vision, dtype))(k2),
            "projector": jax.jit(
                lambda k: init_projector(k, cfg.mm_hidden_size, cfg.llama.hidden_size, dtype)
            )(k3),
            "traj": jax.jit(
                lambda k: init_traj_decoder(k, cfg.traj, cfg.llama.hidden_size // 2, dtype)
            )(k4),
        }
    else:
        params = jax.jit(lambda key: init_handsonvlm(key, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    jax.clear_caches()  # evict init executables from device memory

    tok = MockTokenizer()
    ids = np.asarray(_eval_prompt(tok, cfg))[None, :]
    ids_j = jnp.asarray(ids)
    rng = np.random.default_rng(0)
    # EK eval protocol frames: 10 unique, tiled x10 to fill the 100-slot
    # interface (epic_dataset.py:89-95). Our path passes unique frames + a
    # frame map (math-identical, infer/sampler.py); the baseline below
    # re-encodes all frames like the reference does.
    n_unique = min(10, cfg.num_frames)
    reps = cfg.num_frames // n_unique
    uframes = rng.normal(
        size=(1, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size)
    )
    images_unique = jnp.asarray(uframes, cfg.cdtype)
    frame_map = np.tile(np.arange(n_unique, dtype=np.int32), reps)
    images = jnp.asarray(np.tile(uframes, (1, reps, 1, 1, 1)), cfg.cdtype)

    # ---- cached decode (this framework) ----
    # chunked decode: K cached steps per dispatch (identical math to the
    # fused device loop, tests/test_sampler_chunked.py); amortizes host
    # dispatch without the fused while-loop's heavy 7B compile
    chunk = int(os.environ.get("HANDSONVLM_BENCH_CHUNK", "32"))
    spec_k = int(os.environ.get("HANDSONVLM_BENCH_SPEC", "0"))

    if spec_k > 0:
        from handsonvlm_tpu.infer.speculative import (
            build_template_bank,
            generate_spec,
        )

        bank = build_template_bank(tok, cfg, ("open the fridge",))
        spec_stats = {}

        def run(seed):
            out, stats = generate_spec(
                params, cfg, ids_j, images_unique, jax.random.PRNGKey(seed),
                max_new_tokens=max_new, k=spec_k, temperature=temp, top_p=0.9,
                frame_map=frame_map, bank_ids=bank, kv_quant=kv_quant,
            )
            spec_stats.update(
                gated=stats["gated"], iters=stats["iters"],
                tok_per_fwd=round(stats["tokens"] / max(stats["iters"], 1), 3))
            return out
    else:
        def run(seed):
            return generate_chunked(
                params, cfg, ids_j, images_unique, jax.random.PRNGKey(seed),
                max_new_tokens=max_new, temperature=temp, top_p=0.9, chunk=chunk,
                frame_map=frame_map, kv_quant=kv_quant,
            )

    out = run(0)
    jax.block_until_ready(out.sequences)  # compile + warmup
    n_iters = 5
    t0 = time.perf_counter()
    total_tokens = 0
    for i in range(1, n_iters + 1):
        out = run(i)
        total_tokens += int(jax.device_get(out.num_tokens).sum())
    t1 = time.perf_counter()
    cached_tps = total_tokens / (t1 - t0)

    # ---- reference algorithm cost on the same chip ----
    # one full-prefix forward (frames re-encoded, no cache) at mid-decode len
    # (headline mode only: secondary modes inherit the headline's baseline
    # via the orchestrator — the no-cache program is mode-independent work)
    if skip_baseline:
        rec = {
            "metric": f"decode_tokens_per_sec_{preset}"
            + ("_int8" if use_int8 else "_int4" if use_int4 else "")
            + (f"_spec{spec_k}" if spec_k > 0 else "")
            + ("_greedy" if temp <= 0 else "")
            + ("_kv8" if kv_quant else ""),
            "value": round(cached_tps, 3),
            "unit": "tokens/s/chip",
            "platform": platform,
            "new_tokens": max_new,
            "wall_s": round(time.time() - t_start, 1),
        }
        if spec_k > 0:
            rec["spec"] = spec_stats  # gated / iters / tok_per_fwd telemetry
        print(json.dumps(rec))
        return
    gen_len = max_new // 2
    full_ids = np.concatenate(
        [ids, rng.integers(3, 30000, size=(1, gen_len))], axis=1
    )
    full_ids_j = jnp.asarray(full_ids)

    @jax.jit
    def nocache_step(params, input_ids, images):
        embed = params["llama"]["embed"]["weight"]
        text_embeds = embed[jnp.where(input_ids < 0, 0, input_ids)]
        vis = encode_video(params, cfg, images)
        sp = splice_visual_tokens(text_embeds, input_ids, vis.astype(text_embeds.dtype))
        hidden, _ = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=sp.embeds, attn_mask=sp.attn_mask
        )
        return lm_logits(params["llama"], cfg.llama, hidden[:, -1:, :])

    nocache_step(params, full_ids_j, images).block_until_ready()
    n_base = 8
    t0 = time.perf_counter()
    for _ in range(n_base):
        r = nocache_step(params, full_ids_j, images)
    r.block_until_ready()
    t1 = time.perf_counter()
    baseline_tps = n_base / (t1 - t0)

    result = {
        "metric": f"decode_tokens_per_sec_{preset}"
        + ("_int8" if use_int8 else "_int4" if use_int4 else "")
        + (f"_spec{spec_k}" if spec_k > 0 else "")
        + ("_greedy" if temp <= 0 else "")
        + ("_kv8" if kv_quant else ""),
        "value": round(cached_tps, 3),
        "unit": "tokens/s/chip",
        "vs_baseline": round(cached_tps / baseline_tps, 3),
        "baseline": "reference no-KV-cache decode algorithm, same chip/weights",
        "baseline_tokens_per_sec": round(baseline_tps, 3),
        "platform": platform,
        "prompt_tokens": int(ids.shape[1]) + cfg.num_visual_tokens - 1,
        "new_tokens": max_new,
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


def run_serve_single():
    """Continuous-batching serving throughput (serve/scheduler.py): R burst
    requests share one decode batch over S slots (int4 weights + int8 KV —
    the only combination whose slot cache fits a 16 GB chip at useful
    lengths). Aggregate tok/s including prefill + CLIP encode. The
    comparable solo number is the `kv8` mode (same weights/cache, one
    request at a time)."""
    t_start = time.time()
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.environ.get(
            "HANDSONVLM_JAX_CACHE", os.path.expanduser("~/.cache/handsonvlm_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.models.clip_vit import init_clip_vision
    from handsonvlm_tpu.models.projector import init_projector
    from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
    from handsonvlm_tpu.ops.int8_matmul import init_llama_int4
    from handsonvlm_tpu.serve.scheduler import ContinuousScheduler

    cfg = _build_config(preset)
    platform = jax.devices()[0].platform
    # 7B: 16 slots x 2048 int8 cache (8.6 GB — same bytes as the old
    # 8 x 4096) beside 3.4 GB int4 weights. Deep slot counts became the
    # right trade through round 4's stack: compacted per-row sweep (DMA
    # tracks valid bytes), compaction (dead buckets reclaimed), and fused
    # group joins (a burst-8 join costs ONE dispatch and ONE cursor
    # bucket). Measured 372-384 tok/s aggregate vs 327 at S=8 x 4096 and
    # 305-312 pre-grouping (docs/PERF_NOTES.md round-4 slots sweeps).
    # 13B's bigger per-position rows keep it at 4 slots.
    slots = int(os.environ.get(
        "HANDSONVLM_BENCH_SLOTS", "16" if preset == "7b" else "4"))
    # 13B: slots stay 4 (KV memory) but burst 8 so the aggregate number
    # amortizes joins over two waves like the 7B config does
    n_req = int(os.environ.get(
        "HANDSONVLM_BENCH_REQS", "32" if preset == "7b" else "8"))
    max_len = int(os.environ.get(
        "HANDSONVLM_BENCH_SERVE_LEN", "2048" if preset == "7b" else "4096"))
    chunk = int(os.environ.get("HANDSONVLM_BENCH_SERVE_CHUNK", "16"))
    max_new = int(os.environ.get("HANDSONVLM_BENCH_NEW_TOKENS", "64"))

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
    jax.clear_caches()

    tok = MockTokenizer()
    ids = np.asarray(_eval_prompt(tok, cfg))[None, :]
    rng = np.random.default_rng(0)
    n_unique = min(10, cfg.num_frames)
    reps = cfg.num_frames // n_unique
    uframes = rng.normal(
        size=(1, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size)
    )
    images_unique = jnp.asarray(uframes, cfg.cdtype)
    frame_map = jnp.asarray(np.tile(np.arange(n_unique, dtype=np.int32), reps))

    # admit_hold coalesces each burst into one full-width join (idle-engine
    # only, so it cannot slow decode): without it small bursts fragment
    # into arrival-timing-dependent narrow widths, so the warm run and the
    # measured rounds compile DIFFERENT join programs — at 13B that put a
    # ~16 s remote compile inside the measured window (ttft_p95 16.28 s,
    # BENCH_LOCAL 2026-08-20)
    sched = ContinuousScheduler(
        params, cfg, slots=slots, max_len=max_len, chunk=chunk,
        temperature=0.5, top_p=0.9, kv_quant="int8",
        admit_hold_s=float(os.environ.get("HANDSONVLM_BENCH_SERVE_HOLD",
                                          "0.25")))

    import threading

    def burst(seed0):
        results = {}

        def one(i):
            out = sched.submit(
                jnp.asarray(ids), images_unique, seed=seed0 + i,
                max_new=max_new, frame_map=frame_map, timeout=3600)
            results[i] = int(out.num_tokens[0])

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(i,)) for i in range(n_req)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return sum(results.values()), time.perf_counter() - t0

    burst(1000)  # compile + warmup
    n_iters = 3
    total_tokens = 0
    total_dt = 0.0
    sched.ttfts.clear()  # warm-run TTFTs include compiles
    for i in range(1, n_iters + 1):
        n, dt = burst(i * 100)
        total_tokens += n
        total_dt += dt
    tt = sorted(sched.ttfts)
    sched.stop()

    print(json.dumps({
        "metric": f"serve_cont_tokens_per_sec_{preset}_int4_kv8",
        "value": round(total_tokens / total_dt, 3),
        "unit": "tokens/s/chip",
        "slots": slots, "burst_requests": n_req, "chunk": chunk,
        "max_len": max_len, "new_tokens": max_new,
        "ttft_p50_s": round(tt[len(tt) // 2], 2) if tt else None,
        "ttft_p95_s": (round(tt[min(len(tt) - 1, int(len(tt) * 0.95))], 2)
                       if tt else None),
        "platform": platform,
        "wall_s": round(time.time() - t_start, 1),
    }))


def run_long_single():
    """Long-context decode: B=4 rows decoding against a ~4096-deep cache —
    the regime where int8 KV's structural 2x cache-bandwidth/footprint win
    must show up as step time (at S<=832 the A/B was tunnel noise,
    docs/PERF_NOTES.md). HANDSONVLM_BENCH_KV picks the cache dtype; the
    kv8 and bf16 variants run in separate processes (both caches cannot
    coexist beside the weights on a 16 GB chip, and freed buffers never
    return to the allocator — CLAUDE.md).

    Beyond-reference by construction: the reference caps context at 2048
    (llava/model/builder.py:154-157) and decodes with use_cache=False.

    Timing: K-chained decode steps in one jit, fresh inputs, device_get
    sync, differenced across two K values (CLAUDE.md tunnel rules)."""
    t_start = time.time()
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")
    kv_quant = os.environ.get("HANDSONVLM_BENCH_KV") or None

    import functools

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.environ.get(
            "HANDSONVLM_JAX_CACHE", os.path.expanduser("~/.cache/handsonvlm_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from handsonvlm_tpu.models.llama import KVCache, QuantKVCache, apply_llama
    from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

    cfg = _build_config(preset).llama
    platform = jax.devices()[0].platform
    # 13B: b=4 int8 KV at s=4608 is ~7.6 GB of cache beside 6.7 GB int4
    # weights — HLO-temp OOM on a 16 GB chip (measured round 5); b=2 fits
    b = int(os.environ.get("HANDSONVLM_BENCH_LONG_B",
                           "4" if preset != "13b" else "2"))
    s = int(os.environ.get("HANDSONVLM_BENCH_LONG_S", "4608"))
    cursor = int(os.environ.get("HANDSONVLM_BENCH_LONG_CURSOR", "4096"))

    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    shape = (cfg.num_layers, b, s, cfg.kv_heads, cfg.head_dim_)
    if kv_quant == "int8":
        k8 = jax.jit(lambda r: jax.random.randint(r, shape, -127, 128, jnp.int8))(
            jax.random.PRNGKey(1))
        v8 = jax.jit(lambda r: jax.random.randint(r, shape, -127, 128, jnp.int8))(
            jax.random.PRNGKey(2))
        sc = jnp.full((cfg.num_layers, b, cfg.kv_heads, s), 0.02, jnp.float32)
        cache = QuantKVCache(k=k8, v=v8, ks=sc, vs=sc,
                             index=jnp.asarray(cursor, jnp.int32))
    else:
        cache = KVCache.create(cfg, b, s, jnp.bfloat16)
        cache = type(cache)(k=cache.k, v=cache.v,
                            index=jnp.asarray(cursor, jnp.int32))
    jax.block_until_ready(cache.k)

    import dataclasses

    def make_chunk(k_steps):
        # the bf16 cache is DONATED and rebound call-to-call: a non-donated
        # carry pays a full-cache copy at loop entry, and the bf16 cache
        # (9.7 GiB at B=4, S=4608) cannot afford input+copy beside the
        # weights (measured remote-compile failure). The int8 cache is NOT
        # donated: its donated program dies at runtime with a backend
        # InvalidArgument (aliasing/layout conflict on the quant pytree),
        # and it fits without donation. Differenced two-K timing cancels
        # per-call constants (incl. the entry copy) either way, so the
        # kv8/bf16 numbers stay comparable; the cursor is re-pinned
        # between calls.
        donate = kv_quant != "int8"

        @functools.partial(jax.jit, donate_argnums=(1,) if donate else ())
        def chunk(params, cache, x):
            def body(i, state):
                x, cache, acc = state
                hidden, cache = apply_llama(
                    params, cfg, inputs_embeds=x, kv_cache=cache,
                    attn_impl="auto")
                x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
                return x, cache, acc + hidden[:, :, :1].sum()

            _, cache2, acc = jax.lax.fori_loop(
                0, k_steps, body, (x, cache, 0.0))
            # non-donated variant must NOT output the cache: the caller
            # would have to rebind it, and every dropped 4.8 GB buffer is
            # LOST to the allocator (freed memory never returns —
            # CLAUDE.md). Returning only acc lets XLA keep the final
            # carry internal; the bf16 variant donates, so input==output
            # buffer and rebinding is free.
            return (acc, cache2) if donate else acc

        return chunk

    k_lo, k_hi = 8, 32
    res = {}
    for k_steps in (k_lo, k_hi):
        fn = make_chunk(k_steps)
        x0 = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.hidden_size),
                               jnp.bfloat16)
        out = fn(params, cache, x0)  # compile
        if kv_quant != "int8":
            _, cache = out
            np.asarray(jax.device_get(out[0]))
        else:
            np.asarray(jax.device_get(out))
        times = []
        for rep in range(5):
            if kv_quant != "int8":
                cache = dataclasses.replace(
                    cache, index=jnp.asarray(cursor, jnp.int32))
            xr = jax.random.normal(jax.random.PRNGKey(10 + rep),
                                   (b, 1, cfg.hidden_size), jnp.bfloat16)
            np.asarray(jax.device_get(xr[0, 0, :1]))
            t0 = time.perf_counter()
            out = fn(params, cache, xr)
            if kv_quant != "int8":
                acc, cache = out
            else:
                acc = out
            np.asarray(jax.device_get(acc))
            times.append(time.perf_counter() - t0)
        res[k_steps] = float(np.median(times))
    step_s = (res[k_hi] - res[k_lo]) / (k_hi - k_lo)

    print(json.dumps({
        "metric": (f"decode_long_tokens_per_sec_{preset}_int4_s{cursor}_b{b}"
                   + ("_kv8" if kv_quant else "_kvbf16")),
        "value": round(b / step_s, 3),
        "unit": "tokens/s/chip",
        "step_ms": round(step_s * 1e3, 3),
        "batch": b, "cache_len": s, "cursor": cursor,
        "platform": platform,
        "wall_s": round(time.time() - t_start, 1),
    }))


MODE_ENV = {
    # mode name -> env overrides for the child process
    "spec": {"HANDSONVLM_BENCH_QUANT": "int4", "HANDSONVLM_BENCH_SPEC": "4"},
    "spec_greedy": {"HANDSONVLM_BENCH_QUANT": "int4",
                    "HANDSONVLM_BENCH_SPEC": "4", "HANDSONVLM_BENCH_TEMP": "0"},
    "seq": {"HANDSONVLM_BENCH_QUANT": "int4", "HANDSONVLM_BENCH_SPEC": "0"},
    "kv8": {"HANDSONVLM_BENCH_QUANT": "int4", "HANDSONVLM_BENCH_SPEC": "0",
            "HANDSONVLM_BENCH_KV": "int8"},
    # spec x kv8 through the t>1 windowed verify kernel (round 3)
    "spec_kv8": {"HANDSONVLM_BENCH_QUANT": "int4", "HANDSONVLM_BENCH_SPEC": "4",
                 "HANDSONVLM_BENCH_TEMP": "0", "HANDSONVLM_BENCH_KV": "int8"},
    "int8": {"HANDSONVLM_BENCH_QUANT": "int8", "HANDSONVLM_BENCH_SPEC": "0"},
    "bf16": {"HANDSONVLM_BENCH_QUANT": "", "HANDSONVLM_BENCH_SPEC": "0"},
    "train": {"HANDSONVLM_BENCH_TRAIN": "1"},
    # continuous-batching serving (round 3): S slots share one decode batch
    "serve_cont": {"HANDSONVLM_BENCH_SERVE": "1"},
    # long-context decode (round 4): int8 KV's regime — S~4096, B=4
    "long4k_kv8": {"HANDSONVLM_BENCH_LONG": "1", "HANDSONVLM_BENCH_KV": "int8"},
    "long4k_bf16": {"HANDSONVLM_BENCH_LONG": "1", "HANDSONVLM_BENCH_KV": ""},
}


def run_train_single():
    """7B QLoRA SFT step throughput (the reference's primary workload,
    scripts/finetune.sh; measured state in docs/PERF_NOTES.md 'Training
    throughput'). One EK-shaped batch, K steps, tokens/s."""
    t_start = time.time()
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.environ.get(
            "HANDSONVLM_JAX_CACHE", os.path.expanduser("~/.cache/handsonvlm_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.models.lora import init_lora
    from handsonvlm_tpu.train.step import make_train_step
    from handsonvlm_tpu.train.train_state import create_train_state, make_optimizer
    from tools.perf_train_step import flops_per_step, make_batch

    # 7B trains on the int8 base: higher fidelity AND faster than int4
    # (53.7% vs 45.5% MFU — the nibble-unpack taxes every training GEMM,
    # docs/PERF_NOTES.md round 4); 13B keeps int4 (int8 base + Adam
    # moments exceed the 16 GB chip)
    base_q = "int8" if preset == "7b" else "int4"
    params, cfg, _ = load_pretrained_model(
        f"random:{preset}", preset, quantize=base_q
    )
    params["lora"] = init_lora(jax.random.PRNGKey(42), cfg.llama, r=128, alpha=256)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_frames=10)
    # 13B needs bf16 Adam moments to fit beside the int4 base on one 16 GB
    # chip (same flag the trainer CLI exposes as --mu-bf16, README)
    tx = make_optimizer(learning_rate=2e-5, params_template=params,
                        freeze_top_keys=("vision", "llama"),
                        mu_dtype=jnp.bfloat16 if preset == "13b" else None)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx)
    b, t = 1, 413
    t_spliced = t + cfg.num_visual_tokens - 1
    batches = [make_batch(cfg, b, t, 10, seed=sd) for sd in range(2)]
    state, m = step(state, batches[0], jax.random.PRNGKey(0))
    float(m["loss"])
    n_steps = 4
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batches[i % 2], jax.random.PRNGKey(i))
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    fl = flops_per_step(cfg, b, t_spliced, 10)
    print(json.dumps({
        "metric": f"train_tokens_per_sec_{preset}_qlora_r128",
        "value": round(fl["tokens"] / dt, 1),
        "unit": "tokens/s/chip",
        "base_quant": base_q,
        "step_ms": round(dt * 1e3, 1),
        "mfu_6pt_pct": round(fl["6pt"] / dt / 1e12 / 197.0 * 100, 1),
        "loss": round(loss, 3),
        "platform": jax.devices()[0].platform,
        "wall_s": round(time.time() - t_start, 1),
    }))


def subprocess_probe_backend(timeout_s: int = 600):
    """Returns None when the device backend comes up inside timeout_s,
    else a short error string. Runs in a child so a hung init can be
    killed."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ),
        )
    except subprocess.TimeoutExpired:
        return f"device init hung >{timeout_s}s"
    if proc.returncode != 0:
        return (proc.stderr or proc.stdout).strip().splitlines()[-1][:200] \
            if (proc.stderr or proc.stdout).strip() else f"rc={proc.returncode}"
    return None


def probe_backend_with_retries():
    """Backend probe with a bounded retry schedule: the axon tunnel goes
    down for stretches (a single probe at the wrong minute erased round 2's
    whole perf record, BENCH_r02.json). Re-probes every ~5 min up to
    HANDSONVLM_BENCH_PROBE_WALL seconds (default 40 min). Returns None on
    success, else the last error string."""
    per_try = int(os.environ.get("HANDSONVLM_BENCH_PROBE_TIMEOUT", "300"))
    wall = int(os.environ.get("HANDSONVLM_BENCH_PROBE_WALL", "2400"))
    t0 = time.time()
    attempt, err = 0, "unprobed"
    while True:
        attempt += 1
        remaining = wall - (time.time() - t0)
        if attempt > 1 and remaining <= 10:
            return f"{err} (after {attempt - 1} probes over {wall}s)"
        # every attempt (including the first) is clamped to the remaining
        # wall so a caller's small PROBE_WALL is actually honored
        budget = max(30, min(per_try, int(remaining)))
        t_probe = time.time()
        err = subprocess_probe_backend(timeout_s=budget)
        if err is None:
            return None
        print(f"bench: backend probe {attempt} failed ({err}); "
              f"{max(0, int(wall - (time.time() - t0)))}s of retry budget left",
              file=sys.stderr, flush=True)
        # a fast failure (backend raised) still waits out the 5-min slot so
        # the schedule covers the whole wall instead of burning attempts
        slack = 300 - (time.time() - t_probe)
        if slack > 0 and (time.time() - t0) + slack < wall:
            time.sleep(slack)


def last_good_local(path: str = "BENCH_LOCAL.json"):
    """Newest BENCH_LOCAL.json record with a nonzero value, for outage
    artifacts: the reported value stays 0.0 (honesty — nothing ran), but
    the artifact carries the last builder-measured number + its age.
    Prefers the headline metric (int4 sequential decode for the active
    preset) over whatever mode happened to run last."""
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")
    headline_metric = f"decode_tokens_per_sec_{preset}_int4"
    try:
        here = os.path.join(os.path.dirname(os.path.abspath(__file__)), path)
        best, best_headline = None, None
        with open(here) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("value", 0) > 0:
                    best = rec
                    if rec.get("metric") == headline_metric:
                        best_headline = rec
        best = best_headline or best
        if best is None:
            return None
        mtime = os.path.getmtime(here)
        return {
            "note": ("builder-local measurement from a prior session; NOT "
                     "produced by this run (backend was unavailable)"),
            "file_age_hours": round((time.time() - mtime) / 3600, 1),
            **best,
        }
    except OSError:
        return None


def _run_mode(mode: str, extra_env: dict, timeout_s: int = 3000):
    """One bench mode in its own process (the only reliable way to return
    device memory on this backend — see module docstring). Returns the
    child's parsed JSON line or an {"error": ...} record."""
    import subprocess

    env = dict(os.environ)
    env.update(MODE_ENV[mode])
    env.update(extra_env)
    env["HANDSONVLM_BENCH_SINGLE"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout {timeout_s}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": f"rc={proc.returncode} no JSON",
            "tail": (proc.stderr or proc.stdout)[-400:]}


def main():
    preset = os.environ.get("HANDSONVLM_BENCH_PRESET", "7b")
    single = os.environ.get("HANDSONVLM_BENCH_SINGLE", "0") == "1"
    if single or preset not in ("7b", "13b"):
        # smoke/graft presets and mode children stay single-process
        if os.environ.get("HANDSONVLM_BENCH_TRAIN", "0") == "1":
            run_train_single()
        elif os.environ.get("HANDSONVLM_BENCH_SERVE", "0") == "1":
            run_serve_single()
        elif os.environ.get("HANDSONVLM_BENCH_LONG", "0") == "1":
            run_long_single()
        else:
            run_single()
        return

    t0 = time.time()
    modes = [
        m.strip()
        for m in os.environ.get(
            "HANDSONVLM_BENCH_MODES",
            "seq,spec,spec_greedy,kv8,spec_kv8,int8,bf16,train,serve_cont,"
            "long4k_kv8,long4k_bf16"
        ).split(",")
        if m.strip() in MODE_ENV
    ] or ["spec"]

    # dead-backend handling: the axon tunnel can hang device init for hours
    # (2026-08-17 outage wiped the round-2 record). Retry on a ~5-min
    # schedule up to a 40-min wall; on persistent outage emit an artifact
    # that still carries the last builder-local measurement for context.
    probe = probe_backend_with_retries()
    if probe is not None:
        out = {
            "metric": f"decode_tokens_per_sec_{preset}", "value": 0.0,
            "unit": "tokens/s/chip", "vs_baseline": 0.0,
            "error": f"backend unavailable: {probe}",
            "wall_s": round(time.time() - t0, 1),
        }
        lg = last_good_local()
        if lg is not None:
            out["last_good_local"] = lg
        print(json.dumps(out))
        return

    headline = _run_mode(modes[0], {})
    result = dict(headline)
    if "error" in headline:
        # never leave the driver without a metric line
        result = {"metric": f"decode_tokens_per_sec_{preset}", "value": 0.0,
                  "unit": "tokens/s/chip", "vs_baseline": 0.0, **headline}
    base_tps = headline.get("baseline_tokens_per_sec")

    extras = {}
    for mode in modes[1:]:
        r = _run_mode(mode, {"HANDSONVLM_BENCH_NOBASE": "1"})
        if base_tps and "value" in r and mode != "train":
            # cross-PROCESS ratio: the baseline ran in the headline child,
            # and tunnel throughput varies 1.5-2x run to run (CLAUDE.md) —
            # label it approximate rather than publishing it as vs_baseline
            r["vs_baseline_approx_cross_process"] = round(r["value"] / base_tps, 3)
        extras[mode] = r
    if extras:
        result["modes"] = extras
    result["wall_s"] = round(time.time() - t0, 1)

    # bench->driver contract (VERDICT r4 #4): the driver tail-captures
    # stdout and parses the LAST line; the full multi-mode document outgrew
    # that capture in round 4 ("parsed": null). Persist the full record to
    # BENCH_LOCAL.json and keep the final stdout line compact: headline
    # fields + one {mode: value} map.
    try:
        here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_LOCAL.json")
        with open(here, "a") as f:
            f.write(json.dumps(result) + "\n")
    except OSError as e:
        print(f"bench: BENCH_LOCAL.json write failed: {e}", file=sys.stderr)

    compact = {k: v for k, v in result.items() if k != "modes"}
    if extras:
        compact["modes"] = {
            m: (round(r["value"], 3) if isinstance(r.get("value"), (int, float))
                else {"error": str(r.get("error", "?"))[:80]})
            for m, r in extras.items()
        }
        compact["detail"] = "BENCH_LOCAL.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
