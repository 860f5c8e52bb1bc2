"""Latency-bounded serving operating point (VERDICT r4 #5).

Sweeps continuous-serving configs (slots x max_len x max_join_group) on
the real chip and reports, per point: aggregate tok/s, TTFT p50/p95/max,
request latency p50/max, and — when a TTFT SLO is set — the shed rate.
The deliverable is the table a serving operator needs: the throughput-max
config (S=16x2048, TTFT p50 ~3.5 s in round 4) next to the best config
whose measured TTFT p50 <= 2 s, plus one SLO-enforced row showing
admission control holding the bound on an overloaded burst.

Each operating point runs in its OWN subprocess: a (slots, max_len) int8
KV cache is 0.27 GB/slot/2048 at 7B and freed device memory never
returns to the allocator on this tunnel (CLAUDE.md) — two configs cannot
coexist in one process. The parent collects each child's last JSON line.

Workload per point: R burst-arriving requests (EK eval prompt, tiled
100-frame video, temp 0.5, 64 new tokens) — same as tools/perf_continuous
so numbers are comparable with the round-4 table.

Usage (parent sweep):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    tools/perf_serve_slo.py > /tmp/perf_serve_slo.log 2>&1 &
  env: PERF_POINTS="16x2048x8,8x2048x8,8x2048x4,8x4096x4,16x2048x8@2.0"
       (slots x max_len x max_join_group, optional @ttft_slo seconds)
       PERF_REQS=32 PERF_MAXNEW=64 PERF_ROUNDS=2
       PERF_ARRIVAL_S=0.2 switches from burst to paced open-loop arrivals
       (one submit every 0.2 s) — the sustained-load operating point.
Single point (child): PERF_POINT="16x2048x8" (same @slo syntax).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
if os.environ.get("HANDSONVLM_CPU"):
    jax.config.update("jax_platforms", "cpu")


def _parse_point(s: str):
    slo = None
    if "@" in s:
        s, slo_s = s.split("@")
        slo = float(slo_s)
    slots, max_len, mjg = (int(x) for x in s.split("x"))
    return slots, max_len, mjg, slo


def _pct(sorted_vals, q):
    if not sorted_vals:
        return None
    return sorted_vals[min(len(sorted_vals) - 1, int(len(sorted_vals) * q))]


def run_point(point: str):
    from handsonvlm_tpu.core.config import get_config, tiny_config
    from handsonvlm_tpu.data.conversation import conv_templates
    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.data.tokenization import tokenizer_image_token
    from handsonvlm_tpu.serve.scheduler import ContinuousScheduler, SLORejected

    slots, max_len, mjg, slo = _parse_point(point)
    n_req = int(os.environ.get("PERF_REQS", "32"))
    max_new = int(os.environ.get("PERF_MAXNEW", "64"))
    rounds = int(os.environ.get("PERF_ROUNDS", "2"))
    preset = os.environ.get("HANDSONVLM_PRESET", "7b")

    if preset == "tiny":  # CPU smoke path (tests)
        cfg = tiny_config()
        from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

        params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
        kv_quant = None
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
        kv_quant = "int8"
    jax.block_until_ready(params)

    tok = MockTokenizer()
    conv = conv_templates["v1"].copy()
    conv.append_message(
        conv.roles[0],
        "<image>\nWhere should my hand move to open the fridge?")
    conv.append_message(conv.roles[1], None)
    ids1 = np.asarray(tokenizer_image_token(conv.get_prompt(), tok),
                      np.int64)[None]
    rng = np.random.default_rng(0)
    n_unique = min(10, cfg.num_frames)
    frame_map = np.tile(np.arange(n_unique, dtype=np.int32),
                        cfg.num_frames // n_unique)
    images = jnp.asarray(rng.normal(size=(
        1, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size)),
        cfg.cdtype)
    fmap = jnp.asarray(frame_map)
    ids_j = jnp.asarray(ids1)

    sched = ContinuousScheduler(
        params, cfg, slots=slots, max_len=max_len,
        chunk=int(os.environ.get("PERF_CHUNK", "16")),
        temperature=0.5, top_p=0.9, kv_quant=kv_quant, max_join_group=mjg)

    # PERF_ARRIVAL_S > 0 staggers submits at that inter-arrival gap
    # (sustained open-loop load) instead of an all-at-t0 burst: with the
    # offered rate under capacity the queue stays shallow and TTFT
    # reflects dispatch latency, not queue depth — the steady-state
    # operating point. 0 (default) = burst, comparable to perf_continuous.
    arrival_s = float(os.environ.get("PERF_ARRIVAL_S", "0"))

    def burst(seed0, use_slo):
        served, shed, lat = {}, [], {}
        start = time.perf_counter() + 0.05

        def one(i):
            if arrival_s > 0:
                time.sleep(max(0.0, start + i * arrival_s
                               - time.perf_counter()))
            t0 = time.perf_counter()
            try:
                out = sched.submit(
                    ids_j, images, seed=seed0 + i, max_new=max_new,
                    frame_map=fmap, timeout=3600,
                    ttft_slo=slo if use_slo else None)
            except SLORejected:
                shed.append(i)
                return
            lat[i] = time.perf_counter() - t0
            served[i] = int(out.num_tokens[0])

        t0 = time.perf_counter()
        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n_req)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return sum(served.values()), time.perf_counter() - t0, \
            sorted(lat.values()), len(shed)

    # warm round: compiles + seeds the TTFT EWMAs; never SLO'd (a cold
    # scheduler can't estimate, and compile samples are excluded anyway)
    print(f"point {point}: warming...", flush=True)
    t0 = time.perf_counter()
    burst(10_000, use_slo=False)
    print(f"  warm done in {time.perf_counter() - t0:.0f}s", flush=True)

    best = None
    for r in range(1, rounds + 1):
        sched.ttfts.clear()
        sched.slo_rejections = 0
        n, dt, lats, n_shed = burst(r * 100, use_slo=True)
        tt = sorted(sched.ttfts)
        rec = {
            "point": point, "slots": slots, "max_len": max_len, "mjg": mjg,
            "ttft_slo": slo, "arrival_s": arrival_s or None,
            "round": r, "reqs": n_req, "served": len(lats),
            "shed": n_shed, "tokens": n,
            "tok_per_s": round(n / dt, 1), "wall_s": round(dt, 1),
            "ttft_p50": round(_pct(tt, 0.50), 2) if tt else None,
            "ttft_p95": round(_pct(tt, 0.95), 2) if tt else None,
            "ttft_max": round(tt[-1], 2) if tt else None,
            "lat_p50": round(_pct(lats, 0.50), 1) if lats else None,
            "lat_max": round(lats[-1], 1) if lats else None,
        }
        print(json.dumps(rec), flush=True)
        if best is None or rec["tok_per_s"] > best["tok_per_s"]:
            best = rec
    sched.stop()
    # last line = the point's best round (parent parses this)
    print(json.dumps(best), flush=True)


def main():
    point = os.environ.get("PERF_POINT")
    if point:
        run_point(point)
        return

    points = [p.strip() for p in os.environ.get(
        "PERF_POINTS",
        "16x2048x8,8x2048x8,8x2048x4,8x4096x4,16x2048x8@2.0").split(",")
        if p.strip()]
    results = []
    for p in points:
        env = dict(os.environ)
        env["PERF_POINT"] = p
        print(f"=== {p} ===", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True,
                timeout=int(os.environ.get("PERF_POINT_TIMEOUT", "3600")))
        except subprocess.TimeoutExpired:
            results.append({"point": p, "error": "timeout"})
            continue
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stdout.write((proc.stderr or "")[-800:] + "\n")
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        results.append(rec or {"point": p, "error": f"rc={proc.returncode}"})

    print("\n=== operating-point table ===", flush=True)
    hdr = (f"{'point':>14} {'served':>6} {'shed':>4} {'tok/s':>7} "
           f"{'TTFTp50':>7} {'TTFTp95':>7} {'latp50':>6}")
    print(hdr)
    for r in results:
        if "error" in r:
            print(f"{r['point']:>14} ERROR {r['error']}")
            continue
        print(f"{r['point']:>14} {r['served']:>6} {r['shed']:>4} "
              f"{r['tok_per_s']:>7} {r['ttft_p50']:>7} {r['ttft_p95']:>7} "
              f"{r['lat_p50']:>6}")
    print(json.dumps({"sweep": results}), flush=True)


if __name__ == "__main__":
    main()
