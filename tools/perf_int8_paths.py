"""Int8 decode-path shootout at 7B GEMV shapes (B=1): which path actually
streams weights at int8 bandwidth inside the layer scan?

  bf16      x @ W (the 19.8 ms/step streaming floor at 13.5 GB)
  pallas    current ops/int8_matmul kernel (VMEM dequant) per projection
  w8a8      XLA-native int8 x int8 -> int32 MXU dot, per-token dynamic
            activation quant, fp32 rescale (no bf16 weight copy in HBM)
  w8bf16    XLA dot with int8 weights upcast in-registers? (control: shows
            whether XLA materializes a bf16 copy)

Each variant: fori chunk of K=16 steps over the full 32-layer stack
(7 projections/layer), fresh inputs, device_get sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_int8_paths.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.llama import init_llama  # noqa: E402
from handsonvlm_tpu.ops.int8_matmul import maybe_int8_matmul, quantize_llama  # noqa: E402

K = 16


def quant_act(x):
    """Per-row dynamic int8: x (m, d) -> (x8, scale (m, 1))."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return x8, s


def make_chain(layers, mode):
    def proj(x, w):
        if mode == "bf16":
            return (x @ w).astype(jnp.bfloat16)
        if mode == "pallas":
            return maybe_int8_matmul(x, w).astype(jnp.bfloat16)
        if mode == "w8a8":
            x8, sx = quant_act(x)
            y = jax.lax.dot_general(
                x8, w["w8"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * sx * w["scale"]).astype(jnp.bfloat16)
        if mode == "w8bf16":
            y = jax.lax.dot_general(
                x, w["w8"].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * w["scale"]).astype(jnp.bfloat16)
        raise ValueError(mode)

    @jax.jit
    def chunk(layers, x, rng):
        def body(i, state):
            x, rng, acc = state
            rng, r = jax.random.split(rng)

            def layer(x, lp):
                a = proj(x, lp["attn"]["wq"]) + proj(x, lp["attn"]["wk"]) + proj(x, lp["attn"]["wv"])
                x = x + proj(a, lp["attn"]["wo"])
                g = jax.nn.silu(proj(x, lp["mlp"]["w_gate"])) * proj(x, lp["mlp"]["w_up"])
                return (x + proj(g, lp["mlp"]["w_down"])).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, layers)
            x = x + jax.random.normal(r, x.shape, x.dtype) * 1e-6
            return x, rng, acc + x[:, :1]

        x, rng, acc = jax.lax.fori_loop(0, K, body, (x, rng, jnp.zeros((x.shape[0], 1), x.dtype)))
        return x, acc

    return chunk


def main():
    cfg = get_config("7b").llama

    # bf16 + int8 trees together = 20 GB > HBM; int8 only here.
    # bf16 reference: 19.8 ms/step (tools/perf_decode_floor.py, incl. lm_head)
    def build(key):
        p = init_llama(key, cfg, jnp.bfloat16)
        return quantize_llama(p)["layers"]

    q = jax.jit(build)(jax.random.PRNGKey(0))
    jax.block_until_ready(q)
    gb = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(
        {k: q[k] for k in ("attn", "mlp")})) / 1e9
    print(f"int8 layers: {gb:.1f} GB")

    variants = {
        "pallas": (q, "pallas"),
        "w8a8": (q, "w8a8"),
        "w8bf16": (q, "w8bf16"),
    }
    fns = {}
    for name, (tree, mode) in variants.items():
        t0 = time.time()
        fn = make_chain(tree, mode)
        x = jnp.ones((1, cfg.hidden_size), jnp.bfloat16)
        jax.device_get(fn(tree, x, jax.random.PRNGKey(1))[1])
        fns[name] = fn
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    reps = {n: [] for n in fns}
    for rep in range(5):
        for name, fn in fns.items():
            tree = variants[name][0]
            x = jnp.ones((1, cfg.hidden_size), jnp.bfloat16) * (1 + rep * 1e-3)
            jax.block_until_ready(x)
            t0 = time.time()
            out = fn(tree, x, jax.random.PRNGKey(2 + rep))
            jax.device_get(out[1])
            ms = (time.time() - t0) * 1e3 / K
            reps[name].append(ms)
            print(f"rep{rep} {name:8s} {ms:7.2f} ms/step", flush=True)

    print("\n=== summary (ms/step, median of 5) ===")
    for name, xs in reps.items():
        print(f"{name:8s} {np.median(xs):7.2f}  (min {min(xs):.2f})")


if __name__ == "__main__":
    main()
