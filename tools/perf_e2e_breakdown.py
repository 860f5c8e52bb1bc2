"""End-to-end decode accounting at 7B: where generate_chunked's wall time
goes (prefill / first token / chunks / host).

tools/perf_decode_gap.py showed the chunk itself runs ~22 ms/step while
bench.py reports ~37 ms/step end-to-end; the difference must be prefill +
first-token + per-chunk host sync. This measures each piece in one process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_e2e_breakdown.py [chunk]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.core.config import get_config  # noqa: E402
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm  # noqa: E402
from handsonvlm_tpu.infer.sampler import (  # noqa: E402
    _first_token,
    _prefill_jit,
    generate_chunked,
)

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 16
MAX_NEW = 64


def main():
    import os

    cfg = get_config("7b")
    if os.environ.get("HANDSONVLM_BENCH_QUANT") == "int4":
        from handsonvlm_tpu.models.clip_vit import init_clip_vision
        from handsonvlm_tpu.models.projector import init_projector
        from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
        from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        dtype = cfg.pdtype
        params = {
            "llama": init_llama_int4(k1, cfg.llama, dtype),
            "vision": jax.jit(lambda k: init_clip_vision(k, cfg.vision, dtype))(k2),
            "projector": jax.jit(
                lambda k: init_projector(k, cfg.mm_hidden_size, cfg.llama.hidden_size, dtype)
            )(k3),
            "traj": jax.jit(
                lambda k: init_traj_decoder(k, cfg.traj, cfg.llama.hidden_size // 2, dtype)
            )(k4),
        }
    else:
        params = jax.jit(lambda key: init_handsonvlm(key, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # the bench prompt: 42 text ids + image sentinel
    ids = np.concatenate([[1], np.arange(3, 43), [-200], [13]])[None, :]
    ids_j = jnp.asarray(ids)
    rng = np.random.default_rng(0)
    # EK protocol: 10 unique frames tiled x10; production paths dedup and
    # pass frame_map so CLIP runs the 10 uniques only (evaluator.py)
    uniq = rng.normal(size=(1, 10, 3, 224, 224))
    images = jnp.asarray(uniq, cfg.cdtype)
    frame_map = jnp.asarray(np.repeat(np.arange(10), 10), jnp.int32)
    t_prompt = ids.shape[1] + cfg.num_visual_tokens - 1
    n_chunks = -(-(MAX_NEW - 1) // CHUNK)
    from handsonvlm_tpu.infer.sampler import _round_cache_len
    max_len = _round_cache_len(t_prompt + 1 + n_chunks * CHUNK + 1)
    print(f"prompt {t_prompt} tokens, max_len {max_len}, chunk {CHUNK}")

    # compile everything once via a full run
    out = generate_chunked(params, cfg, ids_j, images, jax.random.PRNGKey(0),
                           max_new_tokens=MAX_NEW, chunk=CHUNK, frame_map=frame_map)
    jax.device_get(out.sequences)

    for rep in range(3):
        t0 = time.perf_counter()
        last_hidden, cache, cache_mask = _prefill_jit(
            params, cfg, ids_j, images, max_len, "auto", None, frame_map)
        jax.device_get(last_hidden[:, :8])
        t1 = time.perf_counter()
        tok, wp = _first_token(params, cfg, last_hidden, jax.random.PRNGKey(rep),
                               temperature=0.5, top_p=0.9)
        jax.device_get(tok)
        t2 = time.perf_counter()
        out = generate_chunked(params, cfg, ids_j, images, jax.random.PRNGKey(rep),
                               max_new_tokens=MAX_NEW, chunk=CHUNK, frame_map=frame_map)
        n = int(jax.device_get(out.num_tokens).sum())
        t3 = time.perf_counter()
        e2e = t3 - t2
        print(f"rep{rep}: prefill {1e3*(t1-t0):7.1f} ms | first_tok {1e3*(t2-t1):6.1f} ms"
              f" | e2e({n} tok) {1e3*e2e:7.1f} ms = {n/e2e:5.1f} tok/s"
              f" | decode-only est {(1e3*(e2e-(t1-t0)-(t2-t1)))/max(n-1,1):5.1f} ms/tok",
              flush=True)


if __name__ == "__main__":
    main()
