"""Compile-only probe: when does XLA materialize whole-stack weight copies
in the decode program (HLO temp), and does weight storage orientation fix it?

Observed OOMs: B=4 bf16 decode_chunk inserts 3x1GB layout-conversion copies
of the stacked wq/wk/wv ({2,1,0} -> {1,2,0}, contracting-dim minor); 13B
int8 decode dies at first execution. This probes HLO temp sizes via AOT
lowering (ShapeDtypeStructs only — nothing allocated on the chip).

Variants: GEMV chain over the 32-layer stack, batch 1/4/8,
  dn   weights stored (L, d, n), y = x @ w          (current convention)
  nd   weights stored (L, n, d), y = dot(x, w, contract d)  (HF orientation)
and the int8 upcast chain at 7B/13B shapes.

Usage: PYTHONPATH=... python tools/perf_layout_probe.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")


def probe(name, fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        m = compiled.memory_analysis()
        if m is None:
            print(f"{name}: no memory analysis available")
            return
        print(f"{name}: temp {m.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {m.argument_size_in_bytes/2**30:.2f} GiB")
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:140]
        print(f"{name}: COMPILE FAIL: {msg}")


def chain_dn(w, x):
    def layer(x, wl):
        return (x @ wl).astype(x.dtype)[:, :x.shape[1]], None

    def body(i, x):
        y, _ = jax.lax.scan(layer, x, w)
        return y

    return jax.lax.fori_loop(0, 16, body, x)


def chain_nd(w, x):
    def layer(x, wl):  # wl (n, d), contract d
        y = jax.lax.dot_general(x, wl, (((1,), (1,)), ((), ())))
        return y.astype(x.dtype)[:, :x.shape[1]], None

    def body(i, x):
        y, _ = jax.lax.scan(layer, x, w)
        return y

    return jax.lax.fori_loop(0, 16, body, x)


def chain_int8_dn(w8, s, x):
    def layer(x, ws):
        wl, sl = ws
        y = jax.lax.dot_general(x, wl.astype(x.dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * sl).astype(x.dtype)[:, :x.shape[1]], None

    def body(i, x):
        y, _ = jax.lax.scan(layer, x, (w8, s))
        return y

    return jax.lax.fori_loop(0, 16, body, x)


def main():
    L, d = 32, 4096
    for b in (1, 4, 8):
        x = jax.ShapeDtypeStruct((b, d), jnp.bfloat16)
        w_dn = jax.ShapeDtypeStruct((L, d, d), jnp.bfloat16)
        w_nd = jax.ShapeDtypeStruct((L, d, d), jnp.bfloat16)
        probe(f"bf16 dn B={b}", chain_dn, w_dn, x)
        probe(f"bf16 nd B={b}", chain_nd, w_nd, x)
    for tag, (Lq, dq) in (("7b", (32, 4096)), ("13b", (40, 5120))):
        x = jax.ShapeDtypeStruct((1, dq), jnp.bfloat16)
        w8 = jax.ShapeDtypeStruct((Lq, dq, dq), jnp.int8)
        s = jax.ShapeDtypeStruct((Lq, dq), jnp.float32)
        probe(f"int8 dn B=1 {tag}", chain_int8_dn, w8, s, x)


if __name__ == "__main__":
    main()
