"""KV-cached autoregressive sampler with the <hand_traj> decode hook.

Replaces `HandsOnVLMForCausalLM.sample` (handsonvlm/model/language_model/
handsonvlm.py:478-672). The reference decodes with `use_cache=False`,
re-encoding 100 frames and the full prefix every step (O(T^2 L) decode,
handsonvlm_inference.py:107); the math, however, only ever reads the hidden
state of the *last* position, so a KV cache is exact. This sampler:

- prefills prompt + visual tokens once,
- runs the whole decode as a single `lax.while_loop` on device (no host
  round-trip per token),
- reproduces the hand-token protocol: when <hand_traj> (32100) is sampled,
  the current hidden state decodes one (right,left) waypoint via the CVAE
  (z ~ 2*N(0,I)); when that token is fed back in, its embedding gets the
  sinusoidal encoding of its own waypoint added (handsonvlm.py:380-396,556).

Sampling matches the reference's HF warper stack: temperature then top-p,
then categorical (temperature<=0 switches to greedy argmax).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import HandsOnVLMConfig
from handsonvlm_tpu.models.handsonvlm import (
    decode_hand_waypoint,
    embed_next_token,
    encode_video,
    splice_visual_tokens,
)
from handsonvlm_tpu.models.llama import KVCache, apply_llama, lm_logits

MAX_HAND_STEPS = 10  # generous cap; eval pads/clips to 4 (inference.py:110-124)

EOS_TOKEN_ID = 2
PAD_TOKEN_ID = 0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SampleOutput:
    """Mirror of the reference's SampleDecoderOnlyOutput (+pred_hands)."""

    sequences: jnp.ndarray  # (B, max_new_tokens), PAD-filled after EOS
    num_tokens: jnp.ndarray  # (B,) generated length incl. EOS
    pred_hands: jnp.ndarray  # (B, 2, MAX_HAND_STEPS, 2)
    num_hands: jnp.ndarray  # (B,)

    def tree_flatten(self):
        return (self.sequences, self.num_tokens, self.pred_hands, self.num_hands), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _warp_logits(logits: jnp.ndarray, temperature: float, top_p: float) -> jnp.ndarray:
    """HF TemperatureLogitsWarper + TopPLogitsWarper semantics (fp32)."""
    logits = logits.astype(jnp.float32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # remove tokens with cumulative prob <= 1 - top_p (HF keeps the rest)
        cutoff_mask = cum_probs <= (1.0 - top_p)
        # threshold: smallest logit that survives
        cutoff_idx = cutoff_mask.sum(axis=-1, keepdims=True)
        threshold = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return logits


def _sample_token(rng, logits, temperature: float, top_p: float):
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = _warp_logits(logits, temperature, top_p)
    return jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)



def _round_cache_len(n: int) -> int:
    """Cache allocations round up to a multiple of 256 so the stacked decode
    kernel's 128-lane block rule always holds (ops/decode_attention.py
    stacked_kernel_ok); the kernel clamps index_maps past the filled length,
    so the extra slots cost HBM capacity but zero decode bandwidth."""
    return -(-n // 256) * 256


def prefill(
    params,
    cfg: HandsOnVLMConfig,
    input_ids: jnp.ndarray,  # (B, T) with IMAGE sentinel
    images: jnp.ndarray,  # (B, T_frames, 3, H, W)
    max_len: int,
    *,
    attn_mask: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    frame_map: Optional[jnp.ndarray] = None,
    tp_mesh=None,
    positions_from_mask: bool = False,
) -> Tuple[jnp.ndarray, KVCache, jnp.ndarray]:
    """Encode video, splice, run the prompt through the decoder once.

    `frame_map` lets callers pass only unique frames (see encode_video).
    `positions_from_mask` derives per-row rotary positions from the
    post-splice mask (real tokens count 0..t_r-1 regardless of left
    padding) instead of the default arange — the continuous engine's
    grouped join uses it so a short row's stream stays position-EXACT vs
    its solo decode (serve/continuous.join_many).
    Returns (last_hidden (B,D), cache, cache_attn_mask (B, max_len))."""
    b, t = input_ids.shape
    embed_table = params["llama"]["embed"]["weight"]
    safe_ids = jnp.where(input_ids < 0, 0, input_ids)
    text_embeds = embed_table[safe_ids]

    visual_tokens = encode_video(
        params, cfg, images, attn_impl=attn_impl, frame_map=frame_map
    )
    sp = splice_visual_tokens(
        text_embeds, input_ids, visual_tokens.astype(text_embeds.dtype),
        attn_mask=attn_mask,
    )
    t_out = sp.embeds.shape[1]
    if t_out + 1 > max_len:
        raise ValueError(f"prompt {t_out} does not fit cache {max_len}")

    cache = KVCache.create(cfg.llama, b, max_len, sp.embeds.dtype)
    cache_mask = jnp.concatenate(
        [sp.attn_mask, jnp.ones((b, max_len - t_out), bool)], axis=1
    )
    positions = None
    if positions_from_mask:
        positions = jnp.clip(
            jnp.cumsum(sp.attn_mask.astype(jnp.int32), axis=1) - 1, 0)
    hidden, cache = apply_llama(
        params["llama"], cfg.llama,
        inputs_embeds=sp.embeds, attn_mask=cache_mask,
        kv_cache=cache, attn_impl=attn_impl, lora=params.get("lora"),
        tp_mesh=tp_mesh, positions=positions,
    )
    return hidden[:, -1, :], cache, cache_mask


def _decode_loop(
    params,
    cfg: HandsOnVLMConfig,
    last_hidden: jnp.ndarray,  # (B, D) from prefill
    cache: KVCache,
    cache_mask: jnp.ndarray,  # (B, max_len)
    rng: jax.Array,
    max_new_tokens: int,
    temperature: float,
    top_p: float,
    eos_token_id: int,
    attn_impl: str,
) -> SampleOutput:
    b, d = last_hidden.shape

    def sample_and_hook(rng, hidden):
        """Sample next token from hidden; decode waypoint if <hand_traj>."""
        r_tok, r_hand = jax.random.split(rng)
        logits = lm_logits(params["llama"], cfg.llama, hidden[:, None, :])[:, 0]
        token = _sample_token(r_tok, logits, temperature, top_p)
        waypoint = decode_hand_waypoint(params, cfg, hidden, r_hand)  # (B,2,2)
        is_hand = token == cfg.hand_token_id
        return token, waypoint, is_hand

    state = {
        "cache": cache,
        "rng": rng,
        "tokens": jnp.zeros((b, max_new_tokens), jnp.int32),
        "num_tokens": jnp.zeros((b,), jnp.int32),
        # stored steps-major (B, M, 2hands, 2xy); transposed on return
        "pred_hands": jnp.zeros((b, MAX_HAND_STEPS, 2, 2), jnp.float32),
        "num_hands": jnp.zeros((b,), jnp.int32),
        "finished": jnp.zeros((b,), bool),
        "step": jnp.zeros((), jnp.int32),
        # token sampled at the previous step (input to this step)
        "cur_token": jnp.zeros((b,), jnp.int32),
        "cur_waypoint": jnp.zeros((b, 2, 2), jnp.float32),
        "has_input": jnp.zeros((), bool),  # first step consumes prefill hidden
        "last_hidden": last_hidden,
    }

    def record(state, token, waypoint, is_hand):
        step = state["step"]
        unfinished = ~state["finished"]
        token = jnp.where(unfinished, token, PAD_TOKEN_ID)
        tokens = state["tokens"].at[:, step].set(token)
        num_tokens = state["num_tokens"] + unfinished.astype(jnp.int32)
        take_hand = is_hand & unfinished
        hc = state["num_hands"]
        slot = jnp.clip(hc, 0, MAX_HAND_STEPS - 1)
        ph = state["pred_hands"]
        upd = jnp.where(take_hand[:, None, None], waypoint, ph[jnp.arange(b), slot])
        ph = ph.at[jnp.arange(b), slot].set(upd)
        num_hands = hc + take_hand.astype(jnp.int32)
        finished = state["finished"] | (token == eos_token_id)
        return dict(
            state,
            tokens=tokens,
            num_tokens=num_tokens,
            pred_hands=ph,
            num_hands=num_hands,
            finished=finished,
            cur_token=token,
            cur_waypoint=waypoint,
            step=step + 1,
        )

    # Step 0: sample from the prefill hidden state.
    rng, r0 = jax.random.split(state["rng"])
    token, waypoint, is_hand = sample_and_hook(r0, last_hidden)
    state = record(dict(state, rng=rng), token, waypoint, is_hand)

    def cond(state):
        return (state["step"] < max_new_tokens) & ~state["finished"].all()

    def body(state):
        rng, r_step = jax.random.split(state["rng"])
        emb = embed_next_token(params, cfg, state["cur_token"], state["cur_waypoint"])
        hidden, new_cache = apply_llama(
            params["llama"], cfg.llama,
            inputs_embeds=emb[:, None, :],
            attn_mask=cache_mask,
            kv_cache=state["cache"],
            attn_impl=attn_impl,
            lora=params.get("lora"),
        )
        token, waypoint, is_hand = sample_and_hook(r_step, hidden[:, 0, :])
        state = dict(state, cache=new_cache, rng=rng, last_hidden=hidden[:, 0, :])
        return record(state, token, waypoint, is_hand)

    state = jax.lax.while_loop(cond, body, state)
    return SampleOutput(
        sequences=state["tokens"],
        num_tokens=state["num_tokens"],
        pred_hands=jnp.transpose(state["pred_hands"], (0, 2, 1, 3)),
        num_hands=state["num_hands"],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "top_p", "eos_token_id",
        "attn_impl", "max_len",
    ),
)
def generate(
    params,
    cfg: HandsOnVLMConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    rng: jax.Array,
    *,
    max_new_tokens: int = 100,
    max_len: int = 0,
    temperature: float = 0.5,
    top_p: float = 0.9,
    eos_token_id: int = EOS_TOKEN_ID,
    attn_impl: str = "auto",
) -> SampleOutput:
    """Full generate: prefill + on-device decode loop.

    Defaults mirror the eval protocol (temp 0.5, top-p 0.9, <=100 new
    tokens; handsonvlm_inference.py:83-109). `max_len=0` sizes the cache to
    prompt + max_new_tokens.
    """
    t_prompt = input_ids.shape[1] + cfg.num_visual_tokens - 1
    if max_len == 0:
        max_len = _round_cache_len(t_prompt + max_new_tokens + 1)
    last_hidden, cache, cache_mask = prefill(
        params, cfg, input_ids, images, max_len, attn_impl=attn_impl
    )
    return _decode_loop(
        params, cfg, last_hidden, cache, cache_mask, rng,
        max_new_tokens, temperature, top_p, eos_token_id, attn_impl,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_len", "attn_impl", "tp_mesh", "kv_quant")
)
def _prefill_jit(params, cfg, input_ids, images, max_len, attn_impl, attn_mask=None,
                 frame_map=None, tp_mesh=None, kv_quant=None):
    out = prefill(params, cfg, input_ids, images, max_len, attn_impl=attn_impl,
                  attn_mask=attn_mask, frame_map=frame_map, tp_mesh=tp_mesh)
    if kv_quant == "int8":
        # quantize INSIDE the prefill program: the bf16 cache stays a
        # program-internal transient (freed device buffers never return to
        # the allocator on this backend, CLAUDE.md)
        from handsonvlm_tpu.models.llama import quantize_kv_cache

        last_hidden, cache, cache_mask = out
        return last_hidden, quantize_kv_cache(cache), cache_mask
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "temperature", "top_p", "attn_impl", "tp_mesh"),
    donate_argnums=(2,),
)
def decode_step(
    params,
    cfg: HandsOnVLMConfig,
    cache: KVCache,
    cache_mask: jnp.ndarray,
    cur_token: jnp.ndarray,  # (B,)
    cur_waypoint: jnp.ndarray,  # (B,2,2)
    rng: jax.Array,
    *,
    temperature: float = 0.5,
    top_p: float = 0.9,
    attn_impl: str = "auto",
    tp_mesh=None,
):
    """One cached decode step (host-driven loop variant).

    Compiles in seconds even at 7B (no giant while-loop program); the host
    drives token-by-token, paying one dispatch per step. Used by
    generate_host for environments where compiling the fused device loop is
    impractical; math identical to the device loop.
    """
    r_tok, r_hand = jax.random.split(rng)
    emb = embed_next_token(params, cfg, cur_token, cur_waypoint)
    hidden, cache = apply_llama(
        params["llama"], cfg.llama, inputs_embeds=emb[:, None, :],
        attn_mask=cache_mask, kv_cache=cache, attn_impl=attn_impl, lora=params.get("lora"),
        tp_mesh=tp_mesh,
    )
    h = hidden[:, 0, :]
    logits = lm_logits(params["llama"], cfg.llama, h[:, None, :])[:, 0]
    token = _sample_token(r_tok, logits, temperature, top_p)
    waypoint = decode_hand_waypoint(params, cfg, h, r_hand)
    return token, waypoint, cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "temperature", "top_p", "attn_impl"),
)
def _first_token(params, cfg, last_hidden, rng, *, temperature, top_p, attn_impl="auto"):
    r_tok, r_hand = jax.random.split(rng)
    logits = lm_logits(params["llama"], cfg.llama, last_hidden[:, None, :])[:, 0]
    token = _sample_token(r_tok, logits, temperature, top_p)
    waypoint = decode_hand_waypoint(params, cfg, last_hidden, r_hand)
    return token, waypoint


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "temperature", "top_p", "attn_impl", "tp_mesh"),
    donate_argnums=(2,),
)
def decode_chunk(
    params,
    cfg: HandsOnVLMConfig,
    cache: KVCache,
    cache_mask: jnp.ndarray,
    cur_token: jnp.ndarray,  # (B,)
    cur_waypoint: jnp.ndarray,  # (B,2,2)
    finished: jnp.ndarray,  # (B,) bool
    rng: jax.Array,
    acc: Optional[Tuple] = None,  # (tokens (B,N), wps (B,N,2,2), hands (B,N))
    offset=None,  # traced scalar: where this chunk's outputs land in acc
    *,
    k: int,
    temperature: float = 0.5,
    top_p: float = 0.9,
    attn_impl: str = "auto",
    eos_token_id: int = EOS_TOKEN_ID,
    tp_mesh=None,
):
    """Run k cached decode steps in one dispatch (fori_loop body compiles
    once). Middle ground between the per-token host loop (dispatch-latency
    bound) and the full fused while_loop (heavy to compile at 7B over a
    remote-compile tunnel). RNG split order matches generate_host exactly.

    With `acc`/`offset`, chunk outputs are written into the preallocated
    device accumulators at a *traced* offset — every chunk reuses one
    compiled program and the host fetches results once after the loop
    (each extra device_get costs a full tunnel round trip, ~35 ms).

    Returns (cache, cur_token, cur_waypoint, finished, rng, tokens (B,k)|acc
    tokens, waypoints, is_hand)."""
    b = cur_token.shape[0]

    def body(i, state):
        cache, tok, wp, fin, rng, tokens, wps, hands = state
        rng, r_step = jax.random.split(rng)
        r_tok, r_hand = jax.random.split(r_step)
        emb = embed_next_token(params, cfg, tok, wp)
        hidden, cache = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=emb[:, None, :],
            attn_mask=cache_mask, kv_cache=cache, attn_impl=attn_impl, lora=params.get("lora"),
            tp_mesh=tp_mesh,
        )
        h = hidden[:, 0, :]
        logits = lm_logits(params["llama"], cfg.llama, h[:, None, :])[:, 0]
        ntok = _sample_token(r_tok, logits, temperature, top_p)
        nwp = decode_hand_waypoint(params, cfg, h, r_hand)
        ntok = jnp.where(fin, PAD_TOKEN_ID, ntok)
        tokens = tokens.at[:, i].set(ntok)
        wps = wps.at[:, i].set(nwp)
        hands = hands.at[:, i].set((ntok == cfg.hand_token_id) & ~fin)
        fin = fin | (ntok == eos_token_id)
        return (cache, ntok, nwp, fin, rng, tokens, wps, hands)
    # NB: do NOT wrap the body in lax.cond(all-finished, skip, run): a
    # conditional in the fori carry path breaks XLA's in-place aliasing of
    # the multi-GB stacked cache (copy-unification per step: measured
    # 83.7 -> 15.7 tok/s at 7B int4, 2026-08-17). Early exit is the
    # caller's job (generate_chunked dispatch-ahead).

    init = (
        cache, cur_token, cur_waypoint, finished, rng,
        jnp.zeros((b, k), jnp.int32),
        jnp.zeros((b, k, 2, 2), jnp.float32),
        jnp.zeros((b, k), bool),
    )
    out = jax.lax.fori_loop(0, k, body, init)
    if acc is None:
        return out
    cache, tok, wp, fin, rng, tokens, wps, hands = out
    acc_tokens, acc_wps, acc_hands = acc
    off = jnp.asarray(offset, jnp.int32)
    acc_tokens = jax.lax.dynamic_update_slice(acc_tokens, tokens, (0, off))
    acc_wps = jax.lax.dynamic_update_slice(acc_wps, wps, (0, off, 0, 0))
    acc_hands = jax.lax.dynamic_update_slice(acc_hands, hands, (0, off))
    return cache, tok, wp, fin, rng, acc_tokens, acc_wps, acc_hands


def generate_chunked(
    params,
    cfg: HandsOnVLMConfig,
    input_ids,
    images,
    rng: jax.Array,
    *,
    max_new_tokens: int = 100,
    max_len: int = 0,
    chunk: int = 16,
    temperature: float = 0.5,
    top_p: float = 0.9,
    eos_token_id: int = EOS_TOKEN_ID,
    attn_impl: str = "auto",
    attn_mask=None,
    frame_map=None,
    tp_mesh=None,
    kv_quant=None,  # "int8": quantized decode cache (halves cache DMA/HBM)
) -> SampleOutput:
    """Prefill + chunked decode. Same outputs as generate/generate_host.

    `attn_mask` (B, T) marks valid prompt positions; pad prompts on the
    LEFT so the final position is real content (rotary attention depends
    only on relative positions, so left padding is logit-exact).
    `frame_map` lets callers pass only unique frames (see encode_video)."""
    import numpy as np

    input_ids = jnp.asarray(input_ids)
    b = input_ids.shape[0]
    t_prompt = input_ids.shape[1] + cfg.num_visual_tokens - 1
    n_chunks = -(-(max_new_tokens - 1) // chunk)
    if max_len == 0:
        # full chunks may run past max_new_tokens; size the cache for them
        max_len = _round_cache_len(t_prompt + 1 + n_chunks * chunk + 1)

    last_hidden, cache, cache_mask = _prefill_jit(
        params, cfg, input_ids, jnp.asarray(images), max_len, attn_impl,
        None if attn_mask is None else jnp.asarray(attn_mask),
        None if frame_map is None else jnp.asarray(frame_map),
        tp_mesh=tp_mesh, kv_quant=kv_quant,
    )
    rng, r0 = jax.random.split(rng)
    token, waypoint = _first_token(
        params, cfg, last_hidden, r0, temperature=temperature, top_p=top_p,
    )

    # device-side accumulation into preallocated buffers, dispatch-ahead:
    # each chunk is dispatched async, and the PREVIOUS chunk's `finished`
    # flag is read only after the next chunk is already in flight — the
    # blocking read (~35 ms tunnel round trip) overlaps that chunk's
    # execution instead of sitting on the critical path (the old one-sync-
    # per-chunk loop cost ~1 ms/token at chunk=32, perf_e2e_breakdown).
    # A mid-stream EOS wastes at most ONE speculatively dispatched chunk;
    # the rare EOS-as-first-token case wastes two (checking it up front
    # would put a blocking sync back on every call, a worse trade).
    n_total = 1 + n_chunks * chunk
    acc = (
        jnp.zeros((b, n_total), jnp.int32).at[:, 0].set(token),
        jnp.zeros((b, n_total, 2, 2), jnp.float32).at[:, 0].set(waypoint),
        jnp.zeros((b, n_total), bool).at[:, 0].set(token == cfg.hand_token_id),
    )
    finished = token == eos_token_id

    produced = 1
    pending = None  # finished flag of the previous (now completed) chunk
    while produced < max_new_tokens:
        (cache, token, waypoint, finished, rng, *acc) = decode_chunk(
            params, cfg, cache, cache_mask, token, waypoint, finished, rng,
            tuple(acc), produced,
            k=chunk, temperature=temperature, top_p=top_p, attn_impl=attn_impl,
            eos_token_id=eos_token_id, tp_mesh=tp_mesh,
        )
        produced += chunk
        # with the next chunk already in flight, this blocking read of the
        # previous chunk's flag overlaps its execution; if everything had
        # finished, only the one in-flight chunk is wasted
        if pending is not None and np.asarray(pending).all():
            break
        pending = finished

    tokens, wps, hands = jax.device_get(acc)  # single bulk fetch
    tokens = np.array(tokens[:, :max_new_tokens])  # device_get is read-only
    wps = np.array(wps[:, :max_new_tokens])
    hands = np.array(hands[:, :max_new_tokens])
    if tokens.shape[1] < max_new_tokens:
        pad = max_new_tokens - tokens.shape[1]
        tokens = np.pad(tokens, ((0, 0), (0, pad)))
        wps = np.pad(wps, ((0, 0), (0, pad), (0, 0), (0, 0)))
        hands = np.pad(hands, ((0, 0), (0, pad)))

    # post-process: num_tokens up to (and incl.) EOS; hand slots in order
    num_tokens = np.zeros((b,), np.int32)
    pred_hands = np.zeros((b, MAX_HAND_STEPS, 2, 2), np.float32)
    num_hands = np.zeros((b,), np.int32)
    for i in range(b):
        row = tokens[i]
        eos_pos = np.nonzero(row == eos_token_id)[0]
        n = int(eos_pos[0]) + 1 if eos_pos.size else max_new_tokens
        num_tokens[i] = n
        tokens[i, n:] = PAD_TOKEN_ID
        for j in np.nonzero(hands[i, :n])[0]:
            slot = min(num_hands[i], MAX_HAND_STEPS - 1)
            pred_hands[i, slot] = wps[i, j]
            num_hands[i] += 1

    # host-built results stay host numpy: consumers all device_get/np.asarray
    # immediately, and round-tripping them through the device costs a full
    # tunnel transfer each way (~35 ms per fetch, docs/PERF_NOTES.md)
    return SampleOutput(
        sequences=np.ascontiguousarray(tokens),
        num_tokens=np.ascontiguousarray(num_tokens),
        pred_hands=np.ascontiguousarray(pred_hands.transpose(0, 2, 1, 3)),
        num_hands=np.ascontiguousarray(num_hands),
    )


def generate_host(
    params,
    cfg: HandsOnVLMConfig,
    input_ids,
    images,
    rng: jax.Array,
    *,
    max_new_tokens: int = 100,
    max_len: int = 0,
    temperature: float = 0.5,
    top_p: float = 0.9,
    eos_token_id: int = EOS_TOKEN_ID,
    attn_impl: str = "auto",
    attn_mask=None,
    frame_map=None,
    tp_mesh=None,
    on_token=None,
    stop_strs=None,
    tokenizer=None,
    kv_quant=None,  # "int8": quantized decode cache
) -> SampleOutput:
    """Host-driven generate: jitted prefill + jitted per-token step.

    Mirrors the reference sample() control flow (handsonvlm.py:543-647) with
    a KV cache; produces the same SampleOutput as `generate`. `on_token`
    (token_id:int -> None) streams tokens as they are sampled (the
    reference's TextStreamer equivalent, llava/serve/cli.py). `attn_mask`
    marks valid prompt positions for LEFT-padded (bucketed) prompts, as in
    generate_chunked; `frame_map` lets callers pass unique frames only
    (see encode_video).

    `stop_strs` (+ `tokenizer`) finish a row when the decoded tail of its
    generated text contains any keyword — the reference's
    KeywordsStoppingCriteria (llava/mm_utils.py:192-215), which chat/serve
    use with the conv separator (e.g. '</s>'). Checked per row on the last
    few tokens, so multi-token keywords straddling a step boundary match.
    """
    import numpy as np

    input_ids = jnp.asarray(input_ids)
    b = input_ids.shape[0]
    t_prompt = input_ids.shape[1] + cfg.num_visual_tokens - 1
    if max_len == 0:
        max_len = _round_cache_len(t_prompt + max_new_tokens + 1)

    last_hidden, cache, cache_mask = _prefill_jit(
        params, cfg, input_ids, jnp.asarray(images), max_len, attn_impl,
        None if attn_mask is None else jnp.asarray(attn_mask),
        None if frame_map is None else jnp.asarray(frame_map),
        tp_mesh=tp_mesh, kv_quant=kv_quant,
    )

    rng, r0 = jax.random.split(rng)
    token, waypoint = _first_token(
        params, cfg, last_hidden, r0, temperature=temperature, top_p=top_p,
    )

    tokens = np.zeros((b, max_new_tokens), np.int32)
    num_tokens = np.zeros((b,), np.int32)
    pred_hands = np.zeros((b, MAX_HAND_STEPS, 2, 2), np.float32)
    num_hands = np.zeros((b,), np.int32)
    finished = np.zeros((b,), bool)

    def record(step, token_h, waypoint_h):
        nonlocal finished
        tok = np.where(finished, PAD_TOKEN_ID, token_h)
        tokens[:, step] = tok
        num_tokens[:] += (~finished).astype(np.int32)
        is_hand = (tok == cfg.hand_token_id) & ~finished
        for i in np.nonzero(is_hand)[0]:
            slot = min(num_hands[i], MAX_HAND_STEPS - 1)
            pred_hands[i, slot] = waypoint_h[i]
            num_hands[i] += 1
        finished = finished | (tok == eos_token_id)
        if stop_strs and tokenizer is not None:
            for i in np.nonzero(~finished)[0]:
                n = num_tokens[i]
                tail = tokenizer.decode([int(t) for t in tokens[i, max(n - 4, 0):n]])
                if any(s in tail for s in stop_strs):
                    finished[i] = True
        if on_token is not None and not finished[0]:
            on_token(int(tok[0]))
        return tok

    tok_h = record(0, np.asarray(token), np.asarray(waypoint))
    step = 1
    while step < max_new_tokens and not finished.all():
        rng, r_step = jax.random.split(rng)
        # `waypoint` was decoded at the same step tok_h was sampled — it is
        # exactly the coordinate embedded when tok_h is a <hand_traj> input
        token, waypoint, cache = decode_step(
            params, cfg, cache, cache_mask, jnp.asarray(tok_h), waypoint,
            r_step, temperature=temperature, top_p=top_p, attn_impl=attn_impl,
            tp_mesh=tp_mesh,
        )
        tok_h = record(step, np.asarray(token), np.asarray(waypoint))
        step += 1

    # host-built results stay host numpy: consumers all device_get/np.asarray
    # immediately, and round-tripping them through the device costs a full
    # tunnel transfer each way (~35 ms per fetch, docs/PERF_NOTES.md)
    return SampleOutput(
        sequences=np.ascontiguousarray(tokens),
        num_tokens=np.ascontiguousarray(num_tokens),
        pred_hands=np.ascontiguousarray(pred_hands.transpose(0, 2, 1, 3)),
        num_hands=np.ascontiguousarray(num_hands),
    )


def clip_pred_hands(pred_hands, num_hands, num_steps: int = 4):
    """Pad/clip decoded waypoints to `num_steps` like the eval harness
    (handsonvlm_inference.py:117-123): keep the LAST num_steps when longer,
    zero-pad at the end when shorter. Returns (out (B,2,4,2), valid (B,)) —
    valid False when no hand token was produced (inference.py:114-116)."""
    import numpy as np

    pred = np.asarray(pred_hands)  # (B,2,M,2)
    n = np.asarray(num_hands)
    b = pred.shape[0]
    out = np.zeros((b, 2, num_steps, 2), np.float32)
    valid = np.zeros((b,), bool)
    for i in range(b):
        k = int(n[i])
        if k == 0:
            continue
        valid[i] = True
        traj = pred[i, :, :k, :]
        if k > num_steps:
            traj = traj[:, -num_steps:, :]
        out[i, :, : traj.shape[1], :] = traj
    return out, valid
