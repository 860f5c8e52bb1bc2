"""A/B: Pallas dequant-MXU int4 prefill kernel vs XLA-native dequant
(unpack + scale + one multi-dim dot_general, XLA free to fuse) at
prefill m. The GEMV-vs-kernel reasoning does not carry over to prefill:
at m=398 the op is MXU-bound, XLA's own GEMM scheduling is excellent, and
the Mosaic restrictions (no multi-dim contractions) do not apply to XLA.

Chains all 4 projections x 32 layers like the real decoder prefill.
Env: M (rows, default 398), PRE_K (chain, default 6).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4, int4_matmul_stacked

M = int(os.environ.get("M", "398"))
K = int(os.environ.get("PRE_K", "6"))


def xla_dequant_matmul(x, leaf, layer_idx):
    """x (m, d) @ dequant(leaf[layer_idx]) via pure XLA."""
    if "w4t" in leaf:
        w4t, gst = leaf["w4t"], leaf["gst"]
        w4 = jax.lax.dynamic_index_in_dim(w4t, layer_idx, 0, keepdims=False)
        gs = jax.lax.dynamic_index_in_dim(gst, layer_idx, 0, keepdims=False)
        NB, G, half, BN = w4.shape
        p32 = w4.astype(jnp.int32)
        lo = ((p32 & 0x0F) - 8).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        w = jnp.concatenate([lo, hi], axis=2)  # (NB, G, group, BN)
        w = w * gs[:, :, None, :].astype(jnp.bfloat16)
        group = 2 * half
        xr = x.reshape(-1, G, group).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            xr, w, (((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (m, NB, BN)
        return out.reshape(x.shape[0], NB * BN)
    w4_all, gs_all = leaf["w4"], leaf["gscale"]
    w4 = jax.lax.dynamic_index_in_dim(w4_all, layer_idx, 0, keepdims=False)
    gs = jax.lax.dynamic_index_in_dim(gs_all, layer_idx, 0, keepdims=False)
    G, half, n = w4.shape
    p32 = w4.astype(jnp.int32)
    lo = ((p32 & 0x0F) - 8).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=1) * gs[:, None, :].astype(jnp.bfloat16)
    xr = x.reshape(-1, G, 2 * half).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        xr, w, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def main():
    cfg = get_config("7b").llama
    params = init_llama_int4(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)
    int4 = params["layers"]["int4"]
    names = ["wqkv", "wo", "wgu", "w_down"]
    dims = {"wqkv": cfg.hidden_size, "wo": cfg.hidden_size,
            "wgu": cfg.hidden_size, "w_down": cfg.intermediate_size}
    L = cfg.num_layers

    def chain(impl, params, x0, steps, seed):
        int4 = params["layers"]["int4"]

        def layer(carry, li):
            h = carry
            for name in names:
                xin = h[:, : dims[name]]
                leaf = int4[name]
                if impl == "xla":
                    o = xla_dequant_matmul(xin, leaf, li)
                else:
                    w, g = ((leaf["w4t"], leaf["gst"]) if "w4t" in leaf
                            else (leaf["w4"], leaf["gscale"]))
                    o = int4_matmul_stacked(xin, w, g, li)
                # fold output back into the carry (keep shapes fixed)
                h = (h + jnp.pad(o.astype(h.dtype) * 1e-6,
                                 ((0, 0), (0, h.shape[1] - o.shape[1])))
                     if o.shape[1] < h.shape[1] else
                     (h + o[:, : h.shape[1]].astype(h.dtype) * 1e-6))
            return h, None

        def step(carry, i):
            h = carry * (1 + seed.astype(carry.dtype) * 1e-9 + i * 0)
            h, _ = jax.lax.scan(layer, h, jnp.arange(L))
            return h, None
        out, _ = jax.lax.scan(step, x0, jnp.arange(steps))
        return out[:, :8].astype(jnp.float32)

    width = max(dims.values())
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, width), jnp.bfloat16)
    jits = {n: jax.jit(lambda p, x, s, seed, n=n: chain(n, p, x, s, seed),
                       static_argnums=2) for n in ("pallas", "xla")}

    # parity of one projection
    li = jnp.asarray(3, jnp.int32)
    leaf = int4["wqkv"]
    w, g = ((leaf["w4t"], leaf["gst"]) if "w4t" in leaf
            else (leaf["w4"], leaf["gscale"]))
    a = np.asarray(jax.device_get(jax.jit(int4_matmul_stacked)(
        x0[:, :dims["wqkv"]], w, g, li)), np.float32)
    bq = np.asarray(jax.device_get(jax.jit(xla_dequant_matmul)(
        x0[:, :dims["wqkv"]], leaf, li)), np.float32)
    rel = np.abs(a - bq).max() / (np.abs(bq).max() + 1e-9)
    print(f"parity rel err pallas-vs-xla: {rel:.3e}", flush=True)

    seed = 0
    best = {}
    for n, fn in jits.items():
        for steps in (1, K + 1):
            np.asarray(jax.device_get(fn(params, x0, steps, jnp.float32(seed))))
            seed += 1
        print(f"compiled {n}", flush=True)
    for rep in range(3):
        for n, fn in jits.items():
            ts = {}
            for steps in (1, K + 1):
                np.asarray(jax.device_get(fn(params, x0, 1, jnp.float32(seed)))); seed += 1
                t0 = time.time()
                np.asarray(jax.device_get(fn(params, x0, steps, jnp.float32(seed))))
                ts[steps] = time.time() - t0
                seed += 1
            per = (ts[K + 1] - ts[1]) / K * 1e3
            best[n] = min(best.get(n, 1e9), per)
            print(f"rep{rep} {n}: {per:.2f} ms/32-layer-chain", flush=True)
    print("---")
    for n, per in best.items():
        print(f"BEST {n}: {per:.2f} ms (M={M})", flush=True)


if __name__ == "__main__":
    main()
