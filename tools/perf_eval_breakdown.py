"""Where does batched-eval wall time go? (round 5)

The fixed full-width-join eval run still measured x0.55 vs serial at
(16 clips, slots=8, max_new=100) while the same engine posts 340+ tok/s
aggregate in serving benches — ~25 s of the batched leg is unaccounted
for. This probe submits the SAME workload scheduler-direct (no evaluator
wrapper, no ADE scoring) with the scheduler's phases timed:

  join_many — CLIP encode + fused prefill + first token (per group)
  step      — one chunk dispatch + packed device_get (per chunk)
  _admit    — admission incl. join_many + host bookkeeping
  _finalize — per-row output device_get + packing
  residual  — wall minus loop-accounted (waits, submit-side host work)

ONE scheduler serves all rounds (a second would OOM: the slots cache is
8.6 GB at S=8 x 4096 int8 and freed device memory never returns on this
tunnel — evaluate(batched=N) allocates per call, so this probe bypasses
it). Requests are prepared upfront; prompts/frames match
tools/perf_eval_batched.SynthClips so compiled buckets are shared.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    tools/perf_eval_breakdown.py > /tmp/perf_eval_breakdown.log 2>&1 &
  env: PERF_CLIPS=16 PERF_SLOTS=8 PERF_MAXNEW=100 HANDSONVLM_PRESET=7b
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
if os.environ.get("HANDSONVLM_CPU"):
    jax.config.update("jax_platforms", "cpu")

from handsonvlm_tpu.core.config import get_config, tiny_config  # noqa: E402
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer  # noqa: E402
from handsonvlm_tpu.eval.evaluator import InferenceEngine  # noqa: E402
from handsonvlm_tpu.serve import scheduler as sched_mod  # noqa: E402
from handsonvlm_tpu.serve.continuous import ContinuousEngine  # noqa: E402


class T:
    def __init__(self):
        self.t = {}
        self.n = {}

    def wrap(self, cls, name):
        orig = getattr(cls, name)

        def timed(obj, *a, **k):
            t0 = time.perf_counter()
            try:
                return orig(obj, *a, **k)
            finally:
                dt = time.perf_counter() - t0
                self.t[name] = self.t.get(name, 0.0) + dt
                self.n[name] = self.n.get(name, 0) + 1

        setattr(cls, name, timed)


def main():
    preset = os.environ.get("HANDSONVLM_PRESET", "7b")
    n_clips = int(os.environ.get("PERF_CLIPS", "16"))
    slots = int(os.environ.get("PERF_SLOTS", "8"))
    max_new = int(os.environ.get("PERF_MAXNEW", "100"))

    if preset == "tiny":
        cfg = tiny_config()
        from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

        params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
        kvq = None
        max_len, chunk = 1024, 4
    else:
        cfg = get_config(preset)
        from handsonvlm_tpu.models.clip_vit import init_clip_vision
        from handsonvlm_tpu.models.projector import init_projector
        from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
        from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        dtype = cfg.pdtype
        params = {
            "llama": init_llama_int4(k1, cfg.llama, dtype),
            "vision": jax.jit(
                lambda k: init_clip_vision(k, cfg.vision, dtype))(k2),
            "projector": jax.jit(lambda k: init_projector(
                k, cfg.mm_hidden_size, cfg.llama.hidden_size, dtype))(k3),
            "traj": jax.jit(lambda k: init_traj_decoder(
                k, cfg.traj, cfg.llama.hidden_size // 2, dtype))(k4),
        }
        kvq = "int8"
        max_len, chunk = 4096, 16
    jax.block_until_ready(params)

    engine = InferenceEngine(
        params=params, cfg=cfg, tokenizer=MockTokenizer(),
        max_new_tokens=max_new, kv_quant=kvq)

    # prepare requests exactly as the fixed evaluator producer does —
    # prompts/frames match perf_eval_batched.SynthClips (warm buckets)
    n_unique = min(10, cfg.num_frames)
    reps = cfg.num_frames // n_unique
    prepared = []
    for i in range(n_clips):
        r = np.random.default_rng(i)
        u = r.normal(size=(n_unique, 3, cfg.vision.image_size,
                           cfg.vision.image_size)).astype(np.float32)
        frames = np.tile(u, (reps, 1, 1, 1))
        prompt = (f"Where should my hand move to if I want to open the "
                  f"fridge shelf {i}?")
        ids = jnp.asarray(engine.build_prompt_ids(prompt))
        images, fmap = engine.dedup_frames(np.asarray(frames[None]))
        prepared.append((ids, jnp.asarray(images, cfg.cdtype),
                         None if fmap is None else jnp.asarray(fmap)))
    jax.block_until_ready([p[1] for p in prepared])

    timers = T()
    timers.wrap(ContinuousEngine, "join_many")
    timers.wrap(ContinuousEngine, "step")
    timers.wrap(ContinuousEngine, "_finalize")
    timers.wrap(ContinuousEngine, "compact")
    timers.wrap(sched_mod.ContinuousScheduler, "_admit")
    timers.wrap(sched_mod.ContinuousScheduler, "_step_once")

    sched = sched_mod.ContinuousScheduler(
        params, cfg, slots=slots, max_len=max_len, chunk=chunk,
        temperature=engine.temperature, top_p=engine.top_p,
        kv_quant=kvq, admit_hold_s=0.25)

    def run(seed0):
        for d in (timers.t, timers.n):
            d.clear()
        toks = {}

        def one(i):
            ids, images, fmap = prepared[i]
            out = sched.submit(ids, images, seed=seed0 + i, max_new=max_new,
                               frame_map=fmap, timeout=3600)
            toks[i] = int(out.num_tokens[0])

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n_clips)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        total = sum(toks.values())
        rec = {"wall_s": round(wall, 2), "tokens": total,
               "tok_per_s": round(total / wall, 1)}
        for key in sorted(timers.t):
            rec[key] = {"n": timers.n[key], "s": round(timers.t[key], 2)}
        accounted = (timers.t.get("_admit", 0.0)
                     + timers.t.get("_step_once", 0.0))
        rec["loop_accounted_s"] = round(accounted, 2)
        rec["residual_s"] = round(wall - accounted, 2)
        print(json.dumps(rec), flush=True)

    print(f"preset={preset} clips={n_clips} slots={slots} "
          f"max_new={max_new} chunk={chunk}", flush=True)
    run(10_000)  # warm (compiles)
    run(100)
    run(200)
    sched.stop()


if __name__ == "__main__":
    main()
