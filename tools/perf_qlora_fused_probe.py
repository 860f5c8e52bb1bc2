"""Standalone A/B: ops/qlora_fused pallas GEMMs vs the XLA int8 path at the
7B QLoRA training shapes.

Round-4 finding to explain: the fused-epilogue train step measured SLOWER
than the unfused int8 base (292 vs 278 ms/step, tools/perf_train_step.py)
even though it removes ~3.8 GB/pass of full-width f32 adapter-delta HBM
traffic. Hypothesis: the pallas base GEMM itself is slower than XLA's
int8->bf16 convert-and-dot at these shapes, swamping the saved traffic.
This probe isolates exactly that: one projection GEMM per variant,
K-chained in ONE jit (differenced two K values — tunnel timing rules,
CLAUDE.md), interleaved variants in one process.

Variants per (m, d, n) training shape:
  xla_base     y = (x @ w8.astype(bf16)) * s            [the unfused path]
  xla_lora     y = xla_base + ((x@A)*ls) @ B            [unfused + adapter]
  pl_base      ops/qlora_fused._fwd_call (no adapter)
  pl_lora      ops/qlora_fused int8_lora_matmul_stacked [fused epilogue]
and their VJPs (the train step pays fwd + bwd-dx).

Env: PERF_M=678 PERF_R=128 PERF_K=8,24 PERF_L=4
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.ops.qlora_fused import (
    int8_lora_matmul_stacked,
    int8_matmul_stacked,
)

M = int(os.environ.get("PERF_M", "678"))
R = int(os.environ.get("PERF_R", "128"))
L = int(os.environ.get("PERF_L", "4"))
KS = [int(x) for x in os.environ.get("PERF_K", "8,24").split(",")]
SHAPES = [  # (name, d, n) — the three distinct 7B projection shapes
    ("qkv/o", 4096, 4096),
    ("gate/up", 4096, 11008),
    ("down", 11008, 4096),
]


def make_ops(d, n, seed):
    rng = np.random.default_rng(seed)
    w8 = jnp.asarray(rng.integers(-127, 128, size=(L, d, n)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.5, 1.5, size=(L, n)) * 0.01, jnp.float32)
    a = jnp.asarray(rng.normal(size=(d, R)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(R, n)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, d)), jnp.bfloat16)
    return x, w8, s, a, b


def variants(d, n):
    li = jnp.asarray(2, jnp.int32)
    ls = jnp.asarray(2.0, jnp.float32)

    def xla_base(x, w8, s, a, b):
        y = jax.lax.dot_general(x, w8[2].astype(x.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return ((y * s[2]).astype(x.dtype), ())

    def xla_lora(x, w8, s, a, b):
        y = jax.lax.dot_general(x, w8[2].astype(x.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        delta = ((x.astype(jnp.float32) @ a) * ls) @ b
        return ((y * s[2] + delta).astype(x.dtype), ())

    def pl_base(x, w8, s, a, b):
        return (int8_matmul_stacked(x, w8, s, li), ())

    def pl_lora(x, w8, s, a, b):
        return (int8_lora_matmul_stacked(x, w8, s, a, b, ls, li), ())

    return {"xla_base": xla_base, "xla_lora": xla_lora,
            "pl_base": pl_base, "pl_lora": pl_lora}


def chain(fn, k, with_bwd):
    """K applications in one jit; each iteration feeds a fresh x derived from
    the previous output (defeats caching/elision). Output reduced to a
    scalar fetched via device_get."""

    def once(x, ops):
        w8, s, a, b = ops
        dx = None
        if with_bwd:
            y, vjp = jax.vjp(lambda xx: fn(xx, w8, s, a, b)[0], x)
            (dx,) = vjp(y)  # cotangent = y: full-width bwd-dx at train dtype
        else:
            y = fn(x, w8, s, a, b)[0]
        # fold n -> d for the next iteration without a (n, d) matmul:
        d = x.shape[1]
        n = y.shape[1]
        if n == d:
            nxt = y
        elif n > d:
            nxt = y[:, :d] + y[:, -d:]
        else:
            nxt = jnp.tile(y, (1, (d + n - 1) // n))[:, :d]
        if dx is not None:
            # dx is (M, d): add AFTER the n->d fold (y is (M, n); adding
            # before broadcast-errored on the non-square shapes — ADVICE r4)
            nxt = nxt + dx.astype(nxt.dtype)
        return (nxt * 1e-3).astype(x.dtype)

    @jax.jit
    def run(x, w8, s, a, b):
        def body(i, xx):
            return once(xx, (w8, s, a, b))
        out = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(out.astype(jnp.float32))

    return run


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  M={M} R={R} L={L}")
    # staged runs on the slow remote compiler: PERF_VARIANTS / PERF_SHAPES /
    # PERF_BWD narrow the (variant, shape, fwd/bwd) grid per invocation
    only_v = [v for v in os.environ.get("PERF_VARIANTS", "").split(",") if v]
    only_s = [s for s in os.environ.get("PERF_SHAPES", "").split(",") if s]
    bwd_modes = {"fwd": (False,), "bwd": (True,),
                 "both": (False, True)}[os.environ.get("PERF_BWD", "both")]
    for with_bwd in bwd_modes:
        tag = "fwd+bwd" if with_bwd else "fwd"
        for name, d, n in SHAPES:
            if only_s and name not in only_s:
                continue
            x, w8, s, a, b = make_ops(d, n, seed=hash((d, n)) % 2**31)
            results = {}
            for vname, fn in variants(d, n).items():
                if only_v and vname not in only_v:
                    continue
                ts = {}
                for k in KS:
                    run = chain(fn, k, with_bwd)
                    out = run(x, w8, s, a, b)
                    float(out)  # compile+warm
                    t0 = time.perf_counter()
                    float(jax.device_get(run(x, w8, s, a, b)))
                    ts[k] = time.perf_counter() - t0
                dt = (ts[KS[-1]] - ts[KS[0]]) / (KS[-1] - KS[0])
                flops = 2 * M * d * n * (3 if with_bwd else 1)
                results[vname] = dt
                print(f"  {tag} {name} ({d}x{n}) {vname}: {dt*1e3:.2f} ms "
                      f"({flops/dt/1e12:.1f} TF/s)", flush=True)
            base = results.get("xla_base")
            if base:
                rel = {k: f"{v/base:.2f}x" for k, v in results.items()}
                print(f"  {tag} {name} vs xla_base: {rel}", flush=True)


if __name__ == "__main__":
    main()
