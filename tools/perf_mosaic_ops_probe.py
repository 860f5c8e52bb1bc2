"""Which elementwise ops does the remote Mosaic compiler legalize?

The int4 kernel wants the cheapest high-nibble extraction; floor(bf16) and
i16 >> both died with opaque HTTP-500 remote-compile errors inside the full
kernel. This isolates single ops in a trivial kernel so the failure (if any)
is attributable. Results feed ops/int8_matmul kernel design + CLAUDE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mosaic_ops_probe.py
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")


def try_op(name, fn, x):
    def kernel(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:]).astype(jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        jax.block_until_ready(out)
        print(f"OK    {name}")
        return True
    except Exception as e:
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:120]}")
        return False


def main():
    i8 = jax.random.randint(jax.random.PRNGKey(0), (256, 256), -128, 128, jnp.int32).astype(jnp.int8)
    bf = i8.astype(jnp.bfloat16)
    f32 = i8.astype(jnp.float32)

    try_op("floor bf16", jnp.floor, bf)
    try_op("floor f32", jnp.floor, f32)
    try_op("round bf16", jnp.round, bf)
    try_op("mul+floor bf16", lambda x: jnp.floor(x * 0.0625), bf)
    try_op("mul+floor f32", lambda x: jnp.floor(x * 0.0625), f32)
    try_op("i16 shift", lambda x: x.astype(jnp.int16) >> 4, i8)
    try_op("i32 shift", lambda x: x.astype(jnp.int32) >> 4, i8)
    try_op("i32 and", lambda x: x.astype(jnp.int32) & 0xF0, i8)
    try_op("bf16 cast of i8", lambda x: x.astype(jnp.bfloat16), i8)


if __name__ == "__main__":
    main()
