"""AOT memory analysis of the REAL bf16 B>1 decode program (VERDICT #9).

Compile-only (ShapeDtypeStructs; nothing allocated): lowers the production
decode_chunk at 7B bf16 for B in {1,4} with (a) default layouts and
(b) AUTO arg layouts, printing HLO temp sizes — the layout-conversion
copies that OOM the chip live in the temps. Also prints the static HBM
budget arithmetic for bf16 batched serving.
"""

import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from jax.experimental.layout import Format, Layout

from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.infer.sampler import decode_chunk
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.models.llama import KVCache

CHUNK = int(os.environ.get("AOT_CHUNK", "8"))
S = int(os.environ.get("AOT_S", "512"))


def arg_shapes(cfg, b):
    lcfg = cfg.llama
    params = jax.eval_shape(lambda k: init_handsonvlm(k, cfg), jax.random.PRNGKey(0))
    cache = KVCache(
        k=jax.ShapeDtypeStruct((lcfg.num_layers, b, S, lcfg.kv_heads, lcfg.head_dim_), cfg.pdtype),
        v=jax.ShapeDtypeStruct((lcfg.num_layers, b, S, lcfg.kv_heads, lcfg.head_dim_), cfg.pdtype),
        index=jax.ShapeDtypeStruct((), jnp.int32),
    )
    return (
        params, cfg, cache,
        jax.ShapeDtypeStruct((b, S), bool),  # cache_mask
        jax.ShapeDtypeStruct((b,), jnp.int32),  # cur_token
        jax.ShapeDtypeStruct((b, 2, 2), cfg.pdtype),  # cur_waypoint (matches
        # decode_hand_waypoint's output dtype — the scan carry must agree)
        jax.ShapeDtypeStruct((b,), bool),  # finished
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # rng key
    )


def analyze(cfg, b, auto):
    args = arg_shapes(cfg, b)
    fn = decode_chunk.__wrapped__  # unwrap the module-level jit

    def wrapped(params, cache, mask, tok, wp, fin, rng):
        return fn(params, cfg, cache, mask, tok, wp, fin, rng,
                  k=CHUNK, temperature=0.5, top_p=0.9, attn_impl="auto")

    pos = (args[0], args[2], args[3], args[4], args[5], args[6], args[7])
    if auto:
        fmts = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), pos)
        jitted = jax.jit(wrapped, in_shardings=fmts)
    else:
        jitted = jax.jit(wrapped)
    lowered = jitted.lower(*pos)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    label = "auto" if auto else "default"
    print(
        f"B={b} {label}: temp {m.temp_size_in_bytes/2**30:.2f} GiB, "
        f"args {m.argument_size_in_bytes/2**30:.2f} GiB, "
        f"out {m.output_size_in_bytes/2**30:.2f} GiB",
        flush=True,
    )
    return compiled


def analyze_prefill_with(cfg, b, param_formats):
    """Lower the prefill program with params PINNED to the decode-preferred
    layouts: if this inserts the conversion copies instead, one bf16 tree
    still cannot serve prefill+batched-decode and the negative result
    stands with this as the HLO evidence."""
    from handsonvlm_tpu.infer.sampler import prefill

    t = 40
    images = jax.ShapeDtypeStruct(
        (b, 10, 3, cfg.vision.image_size, cfg.vision.image_size), cfg.cdtype
    )
    ids = jax.ShapeDtypeStruct((b, t), jnp.int64)

    def wrapped(params, ids_, images_):
        return prefill(params, cfg, ids_, images_, S, attn_impl="auto",
                       frame_map=None)

    params = arg_shapes(cfg, b)[0]
    fmts = (param_formats, Format(Layout.AUTO), Format(Layout.AUTO))
    compiled = jax.jit(wrapped, in_shardings=fmts).lower(params, ids, images).compile()
    m = compiled.memory_analysis()
    print(
        f"B={b} prefill w/ decode-pinned param layouts: "
        f"temp {m.temp_size_in_bytes/2**30:.2f} GiB",
        flush=True,
    )


def main():
    cfg = get_config("7b")
    lcfg = cfg.llama
    p_bytes = 2 * (
        lcfg.num_layers * (4 * lcfg.hidden_size * lcfg.num_heads * lcfg.head_dim_
                           + 3 * lcfg.hidden_size * lcfg.intermediate_size)
        + 2 * lcfg.padded_vocab_size * lcfg.hidden_size
    )
    for b in (1, 4):
        cache_bytes = 2 * 2 * lcfg.num_layers * b * S * lcfg.kv_heads * lcfg.head_dim_
        print(
            f"B={b}: params {p_bytes/2**30:.1f} GiB + cache(S={S}) "
            f"{cache_bytes/2**30:.2f} GiB = {(p_bytes+cache_bytes)/2**30:.1f} "
            "of ~16 GiB HBM",
            flush=True,
        )
    for b in (1, 4):
        for auto in (False, True):
            try:
                compiled = analyze(cfg, b, auto)
            except Exception as e:  # noqa: BLE001
                print(f"B={b} auto={auto}: FAIL {str(e).splitlines()[0][:160]}",
                      flush=True)
                compiled = None
        if b == 4 and compiled is not None:
            try:
                # input_formats = ((per-arg formats...), kwargs-formats)
                analyze_prefill_with(cfg, b, compiled.input_formats[0][0])
            except Exception as e:  # noqa: BLE001
                print(f"B={b} prefill-pinned: FAIL {str(e).splitlines()[0][:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
