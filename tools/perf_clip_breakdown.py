"""CLIP encode decomposition on the real chip (VERDICT r2 weak #7).

B=10 CLIP ViT-L/14 encode measures 14.9 ms vs an ~8 ms MXU floor; the vit
attention kernel already won its part, so the slack is somewhere in XLA's
GEMM scheduling. This probe bounds each component by ablation: run the
encoder with (a) everything, (b) attention replaced by identity, (c) MLP
replaced by identity, (d) projections only (attention+MLP both identity).
Deltas between modes bound the attention / MLP / glue costs. K-chained
dispatch with fresh inputs per rep (tunnel timing rules, CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/perf_clip_breakdown.py   # env: PERF_B=10 PERF_K=8
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models import clip_vit
from handsonvlm_tpu.models.clip_vit import (
    apply_clip_vision,
    init_clip_vision,
    layer_norm,
    quick_gelu,
)
from handsonvlm_tpu.ops.attention import attention


def _layer_ablated(hidden, lp, cfg, attn_impl, *, do_attn, do_mlp):
    b, t, d = hidden.shape
    h = cfg.num_heads
    x = layer_norm(hidden, lp["ln1"]["scale"], lp["ln1"]["bias"], cfg.layer_norm_eps)
    q = (x @ lp["attn"]["wq"]["kernel"] + lp["attn"]["wq"]["bias"]).reshape(b, t, h, d // h)
    k = (x @ lp["attn"]["wk"]["kernel"] + lp["attn"]["wk"]["bias"]).reshape(b, t, h, d // h)
    v = (x @ lp["attn"]["wv"]["kernel"] + lp["attn"]["wv"]["bias"]).reshape(b, t, h, d // h)
    if do_attn:
        out = attention(q, k, v, causal=False, impl=attn_impl).reshape(b, t, d)
    else:
        out = v.reshape(b, t, d)  # keep the projections, drop the attention
    hidden = hidden + out @ lp["attn"]["wo"]["kernel"] + lp["attn"]["wo"]["bias"]
    x = layer_norm(hidden, lp["ln2"]["scale"], lp["ln2"]["bias"], cfg.layer_norm_eps)
    if do_mlp:
        x = quick_gelu(x @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
        hidden = hidden + x @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
    return hidden


def main():
    b = int(os.environ.get("PERF_B", "10"))
    impl = os.environ.get("PERF_IMPL", "auto")  # force vit/xla for in-context A/B
    # PERF_IMPLS=xla,vit: same-process interleaved impl A/B over the FULL
    # encoder only (cross-process comparisons are tunnel-noise, CLAUDE.md)
    impls = [x for x in os.environ.get("PERF_IMPLS", "").split(",") if x]
    k_chain = int(os.environ.get("PERF_K", "8"))
    cfg = get_config("7b").vision
    params = jax.jit(lambda k: init_clip_vision(k, cfg, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    modes = {
        "full": dict(do_attn=True, do_mlp=True),
        "no_attn": dict(do_attn=False, do_mlp=True),
        "no_mlp": dict(do_attn=True, do_mlp=False),
        "proj_only": dict(do_attn=False, do_mlp=False),
    }
    if impls:
        # index the keys: a repeated impl (e.g. xla,vit,xla to gauge
        # in-process drift) must not collapse into one dict entry
        modes = {f"full[{i}:{im}]": dict(do_attn=True, do_mlp=True, impl=im)
                 for i, im in enumerate(impls)}

    # two-K differencing (CLAUDE.md): a single dispatch carries ~30-35 ms of
    # tunnel latency — per-encode time must be the SLOPE between two chain
    # lengths, not one dispatch's wall divided by K
    k_chain = max(k_chain, 4)  # need two distinct K values for the slope
    k_lo = max(1, k_chain // 4)
    results = {}
    for name, abl in modes.items():
        orig = clip_vit._encoder_layer
        mode_impl = abl.pop("impl", impl)
        clip_vit._encoder_layer = functools.partial(_layer_ablated, **abl)
        try:
            def make_run(k_reps):
                @jax.jit
                def run(params, px):
                    def body(i, state):
                        px, acc = state
                        out = apply_clip_vision(params, cfg, px, attn_impl=mode_impl)
                        delta = out[:, 0, :1].sum().astype(jnp.float32)
                        px = (px + (acc + delta) * 1e-6).astype(px.dtype)
                        return px, acc + delta
                    return jax.lax.fori_loop(0, k_reps, body, (px, jnp.float32(0)))[1]
                return run

            runs = {kk: make_run(kk) for kk in (k_lo, k_chain)}
            times = {k_lo: [], k_chain: []}
            for rep in range(4):
                for kk in (k_lo, k_chain):
                    px = jax.random.normal(
                        jax.random.PRNGKey(rep),
                        (b, 3, cfg.image_size, cfg.image_size), jnp.bfloat16)
                    np.asarray(jax.device_get(px[0, 0, 0, :1]))  # upload sync
                    t0 = time.time()
                    np.asarray(jax.device_get(runs[kk](params, px)))
                    times[kk].append((time.time() - t0) * 1e3)
            results[name] = float(
                (np.median(times[k_chain][1:]) - np.median(times[k_lo][1:]))
                / (k_chain - k_lo))
            print(f"{name:10s}: {results[name]:7.2f} ms / encode (B={b})",
                  flush=True)
        finally:
            clip_vit._encoder_layer = orig

    if not impls and all(m in results for m in modes):
        print(f"attention part ~ {results['full'] - results['no_attn']:.2f} ms; "
              f"mlp part ~ {results['full'] - results['no_mlp']:.2f} ms; "
              f"projection+glue floor ~ {results['proj_only']:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
