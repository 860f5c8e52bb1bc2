"""Decompose the 7B int4 B=1 decode step: where do ~9.3 ms/step go?

Mirrors the production stacked scan body (models/llama.py:_layer stacked
fast path) with knockout variants, K-chained in one jit, fresh-input
device_get sync, same-process A/B (CLAUDE.md timing rules):

  full       norm+wqkv+rope+DUS+attn+wo + norm+wgu+silu+w_down
  no_attn    attention kernel replaced by q pass-through
  no_kv      DUS cache writes skipped
  attn_half  attention half only (no MLP)
  mlp_half   MLP half only (known ~4.18 ms standalone)
  gemv_only  the 4 GEMVs + norms, no rope/DUS/attention

Env: PARTS (csv, default all), DECODE_K (chain length, default 64),
S (cache len, default 1024), B (default 1).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.models.llama import apply_rope, rms_norm, rope_cos_sin
from handsonvlm_tpu.ops.decode_attention import decode_attention_stacked
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4, int4_matmul_stacked

B = int(os.environ.get("B", "1"))
S = int(os.environ.get("S", "1024"))
K = int(os.environ.get("DECODE_K", "64"))
PARTS = os.environ.get(
    "PARTS", "full,no_attn,no_kv,attn_half,mlp_half,gemv_only").split(",")


def make_step(cfg, part):
    h, kh, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_
    f = cfg.intermediate_size
    L = cfg.num_layers

    def layer_body(int4, carry, layer_in):
        def iproj(x, name, li):
            leaf = int4[name]
            w, g = ((leaf["w4t"], leaf["gst"]) if "w4t" in leaf
                    else (leaf["w4"], leaf["gscale"]))
            return int4_matmul_stacked(x, w, g, li)

        hidden, ck, cv, cos, sin, cache_index, key_mask = carry
        an, mn, li = layer_in
        b, t, d = hidden.shape
        if part != "mlp_half":
            x = rms_norm(hidden, an, cfg.rms_norm_eps)
            qkv = iproj(x, "wqkv", li)
            q = qkv[..., : h * hd].reshape(b, t, h, hd)
            kx = qkv[..., h * hd: (h + kh) * hd].reshape(b, t, kh, hd)
            vx = qkv[..., (h + kh) * hd:].reshape(b, t, kh, hd)
            if part != "gemv_only":
                q = apply_rope(q, cos, sin)
                kx = apply_rope(kx, cos, sin)
                if part != "no_kv":
                    ck = jax.lax.dynamic_update_slice(
                        ck, kx[None].astype(ck.dtype), (li, 0, cache_index, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, vx[None].astype(cv.dtype), (li, 0, cache_index, 0, 0))
            if part in ("full", "no_kv", "attn_half"):
                out = decode_attention_stacked(
                    q, ck, cv, li, cache_index + 1, key_mask=key_mask)
            else:  # no_attn / gemv_only
                out = q
            out = out.reshape(b, t, h * hd)
            hidden = hidden + iproj(out, "wo", li)
        if part != "attn_half":
            x = rms_norm(hidden, mn, cfg.rms_norm_eps)
            gu = iproj(x, "wgu", li)
            gu = jax.nn.silu(gu[..., :f]) * gu[..., f:]
            hidden = hidden + iproj(gu, "w_down", li)
        return (hidden, ck, cv, cos, sin, cache_index, key_mask), None

    @jax.jit
    def chain(params, x, ck, cv, steps_dummy):
        int4 = params["layers"]["int4"]
        norms = {
            "attn": params["layers"]["attn_norm"]["scale"],
            "mlp": params["layers"]["mlp_norm"]["scale"],
        }
        cache_index = jnp.asarray(S // 2, jnp.int32)
        key_mask = jnp.broadcast_to(
            (jnp.arange(S) < cache_index + 1)[None], (B, S))
        layer_ids = jnp.arange(L)

        import functools

        body = functools.partial(layer_body, int4)

        def step(i, state):
            x, ck, cv, acc = state
            pos = jnp.broadcast_to(cache_index[None, None], (B, 1))
            cos, sin = rope_cos_sin(pos, hd, cfg.rope_theta)
            (hidden, ck, cv, *_), _ = jax.lax.scan(
                body, (x, ck, cv, cos, sin, cache_index, key_mask),
                (norms["attn"], norms["mlp"], layer_ids))
            acc = acc + hidden[:, -1, :1].sum()
            x = (x + hidden * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
            return x, ck, cv, acc
        return jax.lax.fori_loop(0, steps_dummy, step, (x, ck, cv, 0.0))[3]

    return chain


def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    L, kh, hd = cfg.num_layers, cfg.kv_heads, cfg.head_dim_
    ck = jnp.zeros((L, B, S, kh, hd), jnp.bfloat16)
    cv = jnp.zeros((L, B, S, kh, hd), jnp.bfloat16)

    results = {}
    fns = {p: make_step(cfg, p) for p in PARTS}
    # compile all first (same process)
    for p, fn in fns.items():
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 1, cfg.hidden_size),
                              jnp.bfloat16)
        np.asarray(jax.device_get(fn(params, x, ck, cv, 2)))
        print(f"compiled {p}", flush=True)
    for rep in range(3):
        for p, fn in fns.items():
            ts = {}
            for steps in (2, K + 2):
                x = jax.random.normal(
                    jax.random.PRNGKey(rep * 100 + steps),
                    (B, 1, cfg.hidden_size), jnp.bfloat16)
                np.asarray(jax.device_get(x[0, 0, :1]))
                t0 = time.time()
                np.asarray(jax.device_get(fn(params, x, ck, cv, steps)))
                ts[steps] = time.time() - t0
            per = (ts[K + 2] - ts[2]) / K * 1e3
            results.setdefault(p, []).append(per)
            print(f"rep{rep} {p}: {per:.3f} ms/step", flush=True)
    print("---", flush=True)
    for p, vals in results.items():
        print(f"BEST {p}: {min(vals):.3f} ms/step (B={B}, S={S})", flush=True)


if __name__ == "__main__":
    main()
