"""Long-context attention timing: flash vs XLA at T=4096, fwd and fwd+bwd.

Completes the round-3 long-context evidence (ROADMAP item 6): ring
attention + the --max-len 4096 recipe are parity-tested on the CPU mesh;
this measures the single-chip kernel in the regime where the flash kernel
is supposed to win (T >= 2048 per ops/attention dispatch).

Shapes: B=1, H=32, D=128, causal (the 7B LLaMA layer at T=4096), plus
T=2048 as the anchor against the round-1 dispatch-table numbers.

Timing rules (CLAUDE.md): interleaved A/B in one process, fresh inputs per
rep, K-chained calls in ONE jit, difference two K values, device_get sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_flash_t4096.py
  env: PERF_T=2048,4096  PERF_REPS=4
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.ops.attention import attention_xla  # noqa: E402
from handsonvlm_tpu.ops.flash_attention import flash_attention  # noqa: E402


def _chain_fwd(fn, k_reps):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = fn(q, k, v)
            return q + out.astype(q.dtype) * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, k_reps, body, q)
    return run


def _chain_fwdbwd(fn, k_reps):
    """K chained grad-of-loss evaluations: each step runs the kernel's fwd
    AND its custom-vjp bwd, and the dq feeds the next step's query so XLA
    cannot elide any iteration."""
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2) * 1e-6

    g = jax.grad(loss, argnums=0)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            dq = g(q, k, v)
            return q + dq.astype(q.dtype) * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, k_reps, body, q)
    return run


def bench(make_chain, fn, qkv, reps):
    # K-pair must be large enough that (K2-K1)*per-iter time dominates the
    # ~30 ms tunnel jitter: the default (1,5) was fine at T=4096 (ms-scale
    # iters) but produced a negative difference at T=2048 — use
    # PERF_KPAIR=8,40 there.
    K1, K2 = (int(x) for x in os.environ.get("PERF_KPAIR", "1,5").split(","))
    runs = {kk: make_chain(fn, kk) for kk in (K1, K2)}
    for r in runs.values():
        jax.block_until_ready(r(*qkv))
    secs = {K1: [], K2: []}
    for rep in range(reps):
        for kk in (K1, K2):
            q, k, v = (x * (1 + rep * 1e-3) for x in qkv)
            np.asarray(jax.device_get(q[:1, :1, 0, 0]))  # real sync
            t0 = time.time()
            out = runs[kk](q, k, v)
            np.asarray(jax.device_get(out[0, 0, 0, :4]))
            secs[kk].append(time.time() - t0)
    return float(np.median(secs[K2]) - np.median(secs[K1])) * 1e3 / (K2 - K1)


def main():
    ts = [int(x) for x in os.environ.get("PERF_T", "2048,4096").split(",")]
    reps = int(os.environ.get("PERF_REPS", "4"))
    b, h, d = 1, 32, 128
    key = jax.random.PRNGKey(0)

    for t in ts:
        kq, kk, kv = jax.random.split(jax.random.fold_in(key, t), 3)
        q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
        qkv = (q, k, v)

        xla = jax.jit(functools.partial(attention_xla, causal=True))
        flash = jax.jit(functools.partial(
            flash_attention, causal=True, block_q=256, block_k=512))

        # numerics gate first (fwd)
        ref = np.asarray(jax.device_get(xla(*qkv)), np.float32)
        out = np.asarray(jax.device_get(flash(*qkv)), np.float32)
        err = np.max(np.abs(out - ref))
        tag = "" if err < 3e-2 else f"  NUMERICS max|diff|={err:.2e}"

        # causal attention flops: 4 * b*h*d * t^2 / 2 per pass; bwd ~2.5x fwd
        flops_fwd = 2.0 * b * h * d * t * t  # 2*T^2 effective (causal half)
        for label, chain, mult in (
            ("fwd", _chain_fwd, 1.0),
            ("fwd+bwd", _chain_fwdbwd, 3.5),
        ):
            row = {}
            for name, fn in (("xla", xla), ("flash", flash)):
                try:
                    row[name] = bench(chain, fn, qkv, reps)
                except Exception as e:
                    print(f"T={t} {label} {name} FAILED: "
                          f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            line = "  ".join(
                f"{n}={ms:7.2f}ms ({flops_fwd * mult / ms / 1e9:5.1f} TF/s)"
                for n, ms in row.items())
            print(f"T={t:5d} {label:7s} {line}{tag}", flush=True)


if __name__ == "__main__":
    main()
