"""bf16 B>1 decode at 7B via pinned weight layouts (VERDICT #9).

Known failure (docs/PERF_NOTES.md "Batched decode / serving"): the B>1
bf16 decode program wants the stacked qkv projections contracting-dim
minor and inserts 3x1 GB layout-conversion HLO temps -> OOM. AUTO input
layouts fix that program but conflict with the B=1/prefill programs, so
ONE weight tree cannot serve all shapes copy-free.

This probe tests the load-time answer: query the batched program's AUTO
layout preference for its weight arguments, device_put a FRESH tree
directly in that layout (a serving process dedicated to batched traffic
loads it this way), and run the batched decode chain.

Stages (each prints, so partial output is still informative):
  1. AOT memory analysis of the B=4 chain with default vs auto layouts.
  2. Materialize the wq/wk/wv stacks in the preferred layout; run B=4.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config

B = int(os.environ.get("LAYOUT_B", "4"))
S = int(os.environ.get("LAYOUT_S", "512"))
K = int(os.environ.get("LAYOUT_CHAIN", "16"))


def qkv_chain(w, x):
    """B-row GEMV over the stacked qkv projections — the program shape that
    OOMs: scan over (L, d, 3dh) with B>1 rows."""

    def layer(x, wl):
        y = jax.lax.dot_general(
            x, wl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (y[:, : x.shape[1]] * 1e-3 + x).astype(x.dtype), None

    def body(i, x):
        y, _ = jax.lax.scan(layer, x, w)
        return y

    return jax.lax.fori_loop(0, K, body, x)


def main():
    cfg = get_config("7b").llama
    L_, d = cfg.num_layers, cfg.hidden_size
    n = 3 * cfg.num_heads * cfg.head_dim_
    wshape = jax.ShapeDtypeStruct((L_, d, n), jnp.bfloat16)
    xshape = jax.ShapeDtypeStruct((B, d), jnp.bfloat16)

    # stage 1: memory analysis, default vs AUTO
    preferred = None
    for name, fmts in (
        ("default", None),
        ("auto", (Format(Layout.AUTO), Format(Layout.AUTO))),
    ):
        try:
            lowered = (
                jax.jit(qkv_chain, in_shardings=fmts).lower(wshape, xshape)
                if fmts is not None
                else jax.jit(qkv_chain).lower(wshape, xshape)
            )
            compiled = lowered.compile()
            m = compiled.memory_analysis()
            print(
                f"B={B} {name}: temp {m.temp_size_in_bytes/2**30:.2f} GiB, "
                f"args {m.argument_size_in_bytes/2**30:.2f} GiB",
                flush=True,
            )
            if name == "auto":
                in_fmt = compiled.input_formats[0]
                print(f"  preferred weight layout: {in_fmt[0]}", flush=True)
                preferred = in_fmt[0]
        except Exception as e:  # noqa: BLE001
            print(f"B={B} {name}: FAIL {str(e).splitlines()[0][:140]}", flush=True)
            preferred = None

    if preferred is None:
        return

    # stage 2: materialize the tree in the preferred layout and run
    key = jax.random.PRNGKey(0)
    w = jax.device_put(
        jax.random.normal(key, (L_, d, n), jnp.bfloat16) * 0.02, preferred
    )
    jax.block_until_ready(w)
    run = jax.jit(qkv_chain, in_shardings=(preferred, Format(Layout.AUTO)))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d), jnp.bfloat16)
    np.asarray(jax.device_get(run(w, x0)))
    times = []
    for rep in range(3):
        x = jax.random.normal(jax.random.PRNGKey(2 + rep), (B, d), jnp.bfloat16)
        t0 = time.time()
        np.asarray(jax.device_get(run(w, x)))
        times.append((time.time() - t0) * 1e3 / K)
    print(
        f"B={B} pinned-layout qkv chain runs: {np.median(times):.2f} ms/step "
        "(no layout-copy OOM)",
        flush=True,
    )


if __name__ == "__main__":
    main()
