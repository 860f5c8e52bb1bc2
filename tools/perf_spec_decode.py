"""Speculative vs sequential decode at 7B int4 (greedy, B=1).

Three measurements, same process: sequential generate_chunked; spec with no
bank (drafts from prompt/history only — worst case); spec with an oracle
bank holding the model's own continuation (best case, upper bound).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_spec_decode.py
"""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")
from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.infer.sampler import generate_chunked
from handsonvlm_tpu.infer.speculative import generate_spec
from handsonvlm_tpu.models.clip_vit import init_clip_vision
from handsonvlm_tpu.models.projector import init_projector
from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
from handsonvlm_tpu.ops.int8_matmul import init_llama_int4

import os
MAX_NEW = 64
K = int(os.environ.get("SPEC_K", "4"))
QUANT = os.environ.get("SPEC_QUANT", "int4")  # int4 | int8 | bf16

def main():
    cfg = get_config("7b")
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    if QUANT == "bf16":
        from handsonvlm_tpu.models.llama import init_llama
        # jitted: un-jitted 7B init leaves fp32 temporaries that fragment
        # the heap permanently on this tunnel (CLAUDE.md)
        init_dec = lambda k, c, d: jax.jit(
            lambda kk: init_llama(kk, c, dtype=d)
        )(k)
    elif QUANT == "int8":
        from handsonvlm_tpu.ops.int8_matmul import init_llama_int8 as init_dec
    else:
        init_dec = init_llama_int4
    params = {
        "llama": init_dec(k1, cfg.llama, cfg.pdtype),
        "vision": jax.jit(lambda k: init_clip_vision(k, cfg.vision, cfg.pdtype))(k2),
        "projector": jax.jit(lambda k: init_projector(k, cfg.mm_hidden_size, cfg.llama.hidden_size, cfg.pdtype))(k3),
        "traj": jax.jit(lambda k: init_traj_decoder(k, cfg.traj, cfg.llama.hidden_size // 2, cfg.pdtype))(k4),
    }
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    ids = np.concatenate([[1], rng.integers(3, 30000, size=40), [-200], [13]])[None, :]
    uniq = rng.normal(size=(1, 10, 3, 224, 224)).astype(np.float32)
    frame_map = jnp.asarray(np.repeat(np.arange(10), 10), jnp.int32)

    def timed(fn, warm=True):
        if warm:
            fn()
        t0 = time.time(); out = fn(); dt = time.time() - t0
        return out, dt

    def run_seq():
        out = generate_chunked(params, cfg, jnp.asarray(ids), jnp.asarray(uniq, cfg.cdtype),
                               jax.random.PRNGKey(5), max_new_tokens=MAX_NEW,
                               temperature=0.0, chunk=16, frame_map=frame_map)
        return np.asarray(jax.device_get(out.sequences)), int(jax.device_get(out.num_tokens)[0])

    (seq, n), dt = timed(run_seq)
    print(f"sequential: {n} tok in {dt*1e3:7.1f} ms = {n/dt:5.1f} tok/s", flush=True)

    def run_spec(bank):
        out, stats = generate_spec(params, cfg, ids, jnp.asarray(uniq, cfg.cdtype),
                                   jax.random.PRNGKey(5), max_new_tokens=MAX_NEW,
                                   k=K, chunk_iters=16, temperature=0.0, frame_map=frame_map,
                                   bank_ids=bank)
        return out, stats

    for name, bank in (("spec/no-bank", None),
                       ("spec/oracle", np.concatenate([[ids[0, -1]], seq[0, :n]]).astype(np.int32))):
        def go():
            return run_spec(bank)
        (out, stats), dt = timed(go)
        m = int(out.num_tokens[0])
        match = np.array_equal(np.asarray(out.sequences[0, :min(m, n)]), seq[0, :min(m, n)])
        print(f"{name}: {m} tok in {dt*1e3:7.1f} ms = {m/dt:5.1f} tok/s "
              f"({stats['iters']} fwd, {stats['drafts_found']} drafts, greedy-match={match})",
              flush=True)

if __name__ == "__main__":
    main()
