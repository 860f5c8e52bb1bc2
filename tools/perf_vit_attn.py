"""On-chip A/B: VMEM-resident ViT attention vs XLA at CLIP shapes.

Shapes: (B, T=257, H=16, D=64) non-causal unmasked — the CLIP ViT-L/14
tower per layer. B=100 is the un-deduped eval protocol batch (10 frames
x10 tile); B=10 is the production frame_map-deduped batch.

K-chained layers in one jit with freshness re-injection; device_get sync;
two-K differencing; interleaved A/B best-of-reps (CLAUDE.md timing rules).

Env: VIT_B (default 100), VIT_FB (frames per block), VIT_CHAIN (default 24
— one CLIP tower's worth of layers).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.ops.attention import attention_xla
from handsonvlm_tpu.ops.vit_attention import vit_attention

B = int(os.environ.get("VIT_B", "100"))
T, H, D = 257, 16, 64
K = int(os.environ.get("VIT_CHAIN", "2000"))
FB = os.environ.get("VIT_FB")
FB = int(FB) if FB else None


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q0 = jax.random.normal(ks[0], (B, T, H, D)).astype(jnp.bfloat16)
    k0 = jax.random.normal(ks[1], (B, T, H, D)).astype(jnp.bfloat16)
    v0 = jax.random.normal(ks[2], (B, T, H, D)).astype(jnp.bfloat16)

    def chain(attn_fn, q, steps, seed):
        # seed-perturbed input: repeated dispatches with identical inputs
        # can be served from a remote cache (CLAUDE.md timing rules)
        q = q * (1.0 + seed.astype(jnp.bfloat16) * 1e-6)

        def body(x, _):
            o = attn_fn(x, k0, v0)
            # freshness: feed output back as next q so steps can't be elided
            return (o * 0.5 + q * 0.5).astype(x.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=steps)
        return out

    fns = {
        "vit": lambda q, k, v: vit_attention(q, k, v, frames_per_block=FB),
        "xla": lambda q, k, v: attention_xla(q, k, v, causal=False),
    }
    jits = {n: jax.jit(lambda q, s, seed, n=n: chain(fns[n], q, s, seed),
                       static_argnums=1) for n in fns}

    # parity first
    pv = np.asarray(jax.device_get(jax.jit(fns["vit"])(q0, k0, v0)), np.float32)
    px = np.asarray(jax.device_get(jax.jit(fns["xla"])(q0, k0, v0)), np.float32)
    rel = np.abs(pv - px).max() / (np.abs(px).max() + 1e-9)
    print(f"on-chip parity rel err: {rel:.3e}", flush=True)

    seed = 0
    for n, cj in jits.items():
        for steps in (2, K + 2):
            np.asarray(jax.device_get(cj(q0, steps, jnp.float32(seed))))
            seed += 1
    best = {}
    for n, cj in jits.items():
        times = {2: 1e9, K + 2: 1e9}
        for rep in range(3):
            for steps in (2, K + 2):
                # drain the remote queue so t0 doesn't absorb leftovers
                np.asarray(jax.device_get(cj(q0, 2, jnp.float32(seed)))); seed += 1
                t0 = time.time()
                np.asarray(jax.device_get(cj(q0, steps, jnp.float32(seed))))
                times[steps] = min(times[steps], time.time() - t0)
                seed += 1
            print(f"rep{rep} {n}: {(times[K+2]-times[2])/K*1e3:.3f} ms/layer "
                  f"(mins so far)", flush=True)
        best[n] = (times[K + 2] - times[2]) / K * 1e3
    for n, per in best.items():
        print(f"BEST {n}: {per:.3f} ms/layer (B={B}, T={T}, H={H}, D={D}, "
              f"fb={FB})", flush=True)


if __name__ == "__main__":
    main()
