"""Batched EK100 eval A/B (VERDICT r3 #10): serial bs=1 protocol loop vs
--batched (continuous engine) on synthetic EK-shaped clips, real chip.

The serial loop is the reference-faithful protocol
(handsonvlm/evaluation/handsonvlm_inference.py:127-174: one clip at a
time, sampled decode); --batched shares the decode batch across clips
(eval/evaluator._infer_all_batched). Same engine settings, interleaved
order (batched, serial) per round — tunnel throughput varies run to run.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    tools/perf_eval_batched.py > /tmp/perf_eval_batched.log 2>&1 &
  env: PERF_CLIPS=16 PERF_SLOTS=4 PERF_MAXNEW=64 HANDSONVLM_PRESET=7b
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
if os.environ.get("HANDSONVLM_CPU"):
    jax.config.update("jax_platforms", "cpu")

from handsonvlm_tpu.core.config import get_config, tiny_config  # noqa: E402
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer  # noqa: E402
from handsonvlm_tpu.eval.evaluator import (  # noqa: E402
    InferenceEngine,
    evaluate_epic_kitchen_traj,
)


class SynthClips:
    """EK-shaped clips: 10 unique frames tiled x10 (the eval protocol's
    frame layout, epic_dataset.py:89-95), varied prompts."""

    def __init__(self, cfg, n):
        self.n = n
        self.cfg = cfg
        rng = np.random.default_rng(0)
        self.frames = []
        self.prompts = []
        for i in range(n):
            u = rng.normal(size=(10, 3, cfg.vision.image_size,
                                 cfg.vision.image_size)).astype(np.float32)
            reps = cfg.num_frames // 10
            self.frames.append(np.tile(u, (reps, 1, 1, 1)))
            self.prompts.append(
                f"Where should my hand move to if I want to open the "
                f"fridge shelf {i}?")

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "prompt": self.prompts[i],
            "image": self.frames[i],
            "future_hands": np.zeros((2, 5, 2), np.float32),
            "future_valid": np.ones(2, np.float32),
        }


def main():
    preset = os.environ.get("HANDSONVLM_PRESET", "7b")
    n_clips = int(os.environ.get("PERF_CLIPS", "16"))
    slots = int(os.environ.get("PERF_SLOTS", "4"))
    max_new = int(os.environ.get("PERF_MAXNEW", "64"))
    n_samples = int(os.environ.get("PERF_SAMPLES", "1"))
    if preset == "tiny":
        cfg = tiny_config()
        from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

        params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
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
    jax.block_until_ready(params)

    engine = InferenceEngine(
        params=params, cfg=cfg, tokenizer=MockTokenizer(),
        max_new_tokens=max_new,
        kv_quant="int8" if preset != "tiny" else None)
    ds = SynthClips(cfg, n_clips)

    # slots x max_len must fit beside the weights: 8 x 4096 int8 = 8.6 GB
    # (the serving default); 6144 only fits up to 4-5 slots
    max_len = int(os.environ.get(
        "PERF_MAXLEN", "4096" if preset != "tiny" else "1024"))

    def run(batched):
        t0 = time.perf_counter()
        r = evaluate_epic_kitchen_traj(
            engine, ds, seed=1, log_every=0, batched=batched,
            num_samples=n_samples, batched_max_len=max_len,
            batched_chunk=16 if preset != "tiny" else 4)
        return time.perf_counter() - t0, r

    print(f"preset={preset} clips={n_clips} slots={slots} "
          f"max_new={max_new} samples={n_samples}", flush=True)
    # warm both paths (compiles), then interleave
    run(slots)
    run(0)
    for rnd in (1, 2):
        tb, _ = run(slots)
        ts, _ = run(0)
        print(f"round {rnd}: batched={tb:.1f}s serial={ts:.1f}s "
              f"speedup x{ts / tb:.2f}", flush=True)


if __name__ == "__main__":
    main()
