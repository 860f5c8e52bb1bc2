"""Pure HBM->VMEM DMA rate through Pallas for int8 vs int32-bitcast blocks.

Every int4 GEMV variant plateaus at ~11.2 ms for 3.4 GB (~304 GB/s) — half
the 600+ GB/s the bf16/int8 XLA paths reach — regardless of call count,
block size, VPU load, or layout. Hypothesis: Mosaic stores int8 VMEM tiles
16-bit-expanded, so the DMA writes 2x the bytes. If the same bytes bitcast
to int32 (native lane width) stream at full rate, the int4 kernel should
take int32 inputs and unpack 8 nibbles per word on the VPU.

Kernels only *touch* the block (tiny slice reduction) so DMA dominates.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_pallas_dma.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

GB = 2.4  # total bytes streamed per timed call (3 dtypes stay resident:
# freed device buffers are lost on this tunnel, CLAUDE.md)
COLS = 4096  # elements per row
BLOCK_BYTES = 4 * 1024 * 1024


def make_stream(dtype):
    """Array (R, COLS) of `dtype` totalling ~GB bytes; ~4MB blocks; the
    kernel reads every block, accumulates a tiny slice (defeats DCE)."""
    itemsize = jnp.dtype(dtype).itemsize
    block_r = BLOCK_BYTES // (COLS * itemsize)
    rows = int(GB * 1e9) // (COLS * itemsize) // block_r * block_r

    def kernel(w_ref, o_ref):
        # per-(k,i) output: no cross-step dependency to serialize the pipeline
        o_ref[:] = w_ref[:8, :128].astype(jnp.float32)[None]

    nblocks = rows // block_r

    def make_run(k_reps):
        @jax.jit
        def run(w):
            # outer k axis re-reads the whole array k_reps times in ONE
            # pallas call/dispatch — tunnel latency (~35 ms/dispatch) and
            # ramp cancel in the (K2 - K1) difference
            return pl.pallas_call(
                kernel,
                grid=(k_reps, nblocks),
                in_specs=[pl.BlockSpec((block_r, COLS), lambda k, i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda k, i: (k, i, 0)),
                out_shape=jax.ShapeDtypeStruct((k_reps, nblocks * 8, 128), jnp.float32),
            )(w)

        return run

    return make_run, (rows, COLS)


def main():
    for name, dtype in (("int8", jnp.int8), ("int32", jnp.int32),
                        ("bf16", jnp.bfloat16)):
        make_run, shape = make_stream(dtype)
        key = jax.random.PRNGKey(0)
        w = jax.random.randint(key, shape, -100, 100, jnp.int32).astype(dtype) \
            if dtype != jnp.bfloat16 else jax.random.normal(key, shape, jnp.bfloat16)
        total = w.size * w.dtype.itemsize
        K1, K2 = 2, 10
        try:
            runs = {k: make_run(k) for k in (K1, K2)}
            for r in runs.values():
                jax.block_until_ready(r(w))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
            del w
            continue
        # fresh input values each rep WITHOUT new allocations: donated
        # in-place bump (freed buffers never return to the pool here)
        one = jnp.ones((), dtype)
        bump = jax.jit(lambda a, b: a + b, donate_argnums=(0,))
        secs = {K1: [], K2: []}
        for rep in range(4):
            for k in (K1, K2):
                w = bump(w, one)
                # device_get is the only true remote sync (block_until_ready
                # can return early on this tunnel); bump stays untimed
                np.asarray(jax.device_get(w[:1, :1]))
                t0 = time.time()
                out = runs[k](w)
                np.asarray(jax.device_get(out[0, :8]))
                secs[k].append(time.time() - t0)
        d = float(np.median(secs[K2]) - np.median(secs[K1]))
        rate = total * (K2 - K1) / d / 1e9
        print(f"{name:5s} {total/1e9:.2f} GB x{K2-K1} in {d*1e3:7.2f} ms -> {rate:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
