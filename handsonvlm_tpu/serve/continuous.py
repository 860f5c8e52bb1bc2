"""Continuous batching: requests join and leave a shared decode batch at
chunk boundaries (TPU-first serving; the reference serves one request per
generate call, llava/serve/model_worker.py).

Design (shaped by this backend's measured constraints, docs/PERF_NOTES.md):

- ONE persistent stacked cache (L, B_slots, S, K, D) and ONE shared write
  cursor (`cache.index`). Every live row writes its next token at the same
  global position, so the hot path keeps the plain dynamic-update-slice
  writes whose in-place aliasing is proven (per-row scatter writes would
  risk the copy-unification failure that lax.cond-in-carry triggers).
- A joining request's prompt KV is prefilled (B=1) and spliced into its
  slot's plane at [cursor, cursor + plen); the cursor then jumps past it
  for everyone. Other rows simply have a masked hole there — each row's
  valid-key set is tracked in a host-maintained (B, S) mask uploaded at
  chunk boundaries (apply_llama ANDs it with the written-positions mask).
- Rotary positions are per-row local: position = cursor - start_r, where
  start_r is the global slot of the row's first prompt token (apply_llama
  `positions` argument) — a row's logits match a solo decode regardless of
  batch composition, exactly in rng/positions and up to floating-point
  reassociation in attention reductions (the row's keys sit at different
  global cache offsets per composition; tests/test_continuous.py,
  tests/test_eval_batched.py).
- RNG is per-row: step key = fold_in(row_key, local_step), so a request's
  sampled stream is also composition-independent.
- Space: the cursor consumes one prompt bucket per JOIN DISPATCH (a fused
  group join places all its rows' prompts in the same span of their own
  planes — join_many) + chunk * n_chunks of S. `can_admit` refuses joins
  that would overrun; when all slots idle the engine resets the cursor to
  0 (the cache contents are dead then); compact() reclaims dead blocks.

The chunk step reuses the sampler's embed/hand-waypoint protocol
(infer/sampler.decode_chunk semantics) with per-row keys and positions.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from handsonvlm_tpu.core.config import HandsOnVLMConfig
from handsonvlm_tpu.infer.sampler import (
    EOS_TOKEN_ID,
    MAX_HAND_STEPS,
    PAD_TOKEN_ID,
    SampleOutput,
    prefill,
)
from handsonvlm_tpu.models.handsonvlm import decode_hand_waypoint, embed_next_token
from handsonvlm_tpu.models.llama import (
    KVCache,
    QuantKVCache,
    apply_llama,
    lm_logits,
    quantize_kv_cache,
)


def _sample_token_traced(rng, logits, temperature, top_p):
    """`infer.sampler._sample_token` with TRACED scalars (that one branches
    in Python on `temperature <= 0.0` / `top_p < 1.0`, which would recompile
    per distinct user float — unacceptable for serving). Same math:
    temperature<=0 selects the argmax via `where`; top_p=1.0 makes the top-p
    cutoff land on the smallest sorted logit, i.e. a no-op."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(warped, axis=-1)  # ascending
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    cutoff_idx = (cum_probs <= (1.0 - top_p)).sum(axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    warped = jnp.where(warped < threshold, -jnp.inf, warped)
    sampled = jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0.0, sampled, greedy)


def _row_sample(keys, logits, temps, top_ps):
    """Per-row sampling: row r uses ONLY keys[r] / temps[r] / top_ps[r], so
    its stream does not depend on which other requests share the batch —
    and each request keeps its own decode settings inside the shared
    chunk dispatch."""
    return jax.vmap(
        lambda k, lg, t, p: _sample_token_traced(k, lg[None], t, p)[0]
    )(keys, logits, temps, top_ps)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "s1", "attn_impl", "kv_quant"),
    donate_argnums=(1, 8, 9, 10, 11, 12, 13, 14, 15),
)
def _join_jit(params, cache, cfg: HandsOnVLMConfig, input_ids, images,
              row, at_pos, row_key,
              starts, steps, temps, top_ps, row_keys, cur_token,
              cur_waypoint, finished,
              start_val, temperature, top_p, eos_token_id, frame_map,
              *, s1: int, attn_impl: str, kv_quant: Optional[str]):
    """The WHOLE join in one dispatch: prefill ONE request (B=1) into a
    transient cache of bucket length `s1`, splice its KV into slot `row`
    of the persistent cache at `at_pos`, sample the request's first token
    and waypoint, and update every per-row state vector.

    One dispatch is load-bearing: each extra device call pays ~30 ms of
    tunnel latency, and the original join (prefill + first-token + six
    separate row-state updates) spent more wall time on dispatches than on
    prefill compute — 8 burst joins were ~60% of the 64-token serving wall
    (docs/PERF_NOTES.md 'Continuous batching serving'). The transient
    prefill cache stays program-internal (freed device buffers never
    return to the allocator on this backend — CLAUDE.md).

    Returns the updated (cache, row-state vectors..., packed) where
    `packed` is a (6,) f32 [token, waypoint(4), finished] — ONE device_get
    gives the host everything it needs."""
    last_hidden, pcache, _ = prefill(
        params, cfg, input_ids, images, s1, attn_impl=attn_impl,
        frame_map=frame_map)
    if kv_quant == "int8":
        pcache = quantize_kv_cache(pcache)
        ks = jax.lax.dynamic_update_slice(
            cache.ks, pcache.ks, (0, row, 0, at_pos))
        vs = jax.lax.dynamic_update_slice(
            cache.vs, pcache.vs, (0, row, 0, at_pos))
        k = jax.lax.dynamic_update_slice(
            cache.k, pcache.k, (0, row, at_pos, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, pcache.v, (0, row, at_pos, 0, 0))
        cache = dataclasses.replace(cache, k=k, v=v, ks=ks, vs=vs)
    else:
        k = jax.lax.dynamic_update_slice(
            cache.k, pcache.k.astype(cache.k.dtype), (0, row, at_pos, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, pcache.v.astype(cache.v.dtype), (0, row, at_pos, 0, 0))
        cache = dataclasses.replace(cache, k=k, v=v)
    cache = dataclasses.replace(
        cache, index=jnp.asarray(at_pos + s1).astype(jnp.int32))

    last_hidden = last_hidden[0]
    r_tok, r_hand = jax.random.split(jax.random.fold_in(row_key, 0))
    logits = lm_logits(params["llama"], cfg.llama, last_hidden[None, None])[0, 0]
    token = _sample_token_traced(r_tok, logits[None], temperature, top_p)[0]
    waypoint = decode_hand_waypoint(params, cfg, last_hidden[None], r_hand)[0]
    fin = token == eos_token_id

    def setr(vec, val):
        return jax.lax.dynamic_update_index_in_dim(
            vec, jnp.asarray(val).astype(vec.dtype), row, 0)

    starts = setr(starts, start_val)
    steps = setr(steps, 1)
    temps = setr(temps, temperature)
    top_ps = setr(top_ps, top_p)
    row_keys = jax.lax.dynamic_update_index_in_dim(
        row_keys, row_key.astype(row_keys.dtype), row, 0)
    cur_token = setr(cur_token, token)
    cur_waypoint = jax.lax.dynamic_update_index_in_dim(
        cur_waypoint, waypoint.astype(jnp.float32)[None], row, 0)
    finished = setr(finished, fin)
    packed = jnp.concatenate([
        token[None].astype(jnp.float32),
        waypoint.astype(jnp.float32).reshape(4),
        fin[None].astype(jnp.float32),
    ])
    return (cache, starts, steps, temps, top_ps, row_keys, cur_token,
            cur_waypoint, finished, packed)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "attn_impl"),
    donate_argnums=(1,),
)
def _chunk_jit(params, cache, cache_mask, starts, steps, row_keys,
               cur_token, cur_waypoint, finished, temps, top_ps,
               cfg: HandsOnVLMConfig, *,
               k: int, attn_impl: str, eos_token_id: int = EOS_TOKEN_ID):
    """k decode steps for the whole slot batch in one dispatch.

    Same protocol as infer/sampler.decode_chunk, generalized with per-row
    rotary offsets (`starts`), per-row rng (fold_in(row_keys, steps)), and
    the host-maintained key mask. No lax.cond in the carry (aliasing,
    CLAUDE.md); idle/finished rows decode masked garbage that the host
    discards."""
    b = cur_token.shape[0]

    def body(i, state):
        cache, tok, wp, fin, steps, tokens, wps, hands = state
        step_keys = jax.vmap(jax.random.fold_in)(row_keys, steps)
        r_tok = jax.vmap(lambda s: jax.random.split(s)[0])(step_keys)
        r_hand = jax.vmap(lambda s: jax.random.split(s)[1])(step_keys)
        emb = embed_next_token(params, cfg, tok, wp)
        positions = (cache.index - starts)[:, None]
        hidden, cache = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=emb[:, None, :],
            attn_mask=cache_mask, positions=positions, kv_cache=cache,
            attn_impl=attn_impl, lora=params.get("lora"),
        )
        h = hidden[:, 0, :]
        logits = lm_logits(params["llama"], cfg.llama, h[:, None, :])[:, 0]
        ntok = _row_sample(r_tok, logits, temps, top_ps)
        # f32: the carry/accumulator dtype must not follow the param dtype
        # (bf16 at 7B) or the fori carry types mismatch
        nwp = jax.vmap(
            lambda key, hr: decode_hand_waypoint(params, cfg, hr[None], key)[0]
        )(r_hand, h).astype(jnp.float32)
        ntok = jnp.where(fin, PAD_TOKEN_ID, ntok)
        tokens = tokens.at[:, i].set(ntok)
        wps = wps.at[:, i].set(nwp)
        hands = hands.at[:, i].set((ntok == cfg.hand_token_id) & ~fin)
        fin = fin | (ntok == eos_token_id)
        return (cache, ntok, nwp, fin, steps + 1, tokens, wps, hands)

    init = (
        cache, cur_token, cur_waypoint, finished, steps,
        jnp.zeros((b, k), jnp.int32),
        jnp.zeros((b, k, 2, 2), jnp.float32),
        jnp.zeros((b, k), bool),
    )
    (cache, tok, wp, fin, steps, tokens, wps, hands) = jax.lax.fori_loop(
        0, k, body, init)
    # pack the host-bound outputs into ONE array: a device_get is a full
    # tunnel round-trip (~30 ms), and three of them per chunk were pure
    # latency (token ids < 2^24 are exact in f32)
    packed = jnp.concatenate([
        tokens.astype(jnp.float32)[..., None],
        wps.reshape(b, k, 4),
        hands.astype(jnp.float32)[..., None],
    ], axis=-1)
    return cache, tok, wp, fin, steps, packed


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "s1", "attn_impl", "kv_quant"),
    donate_argnums=(1, 8, 9, 10, 11, 12, 13, 14, 15),
)
def _join_many_jit(params, cache, cfg: HandsOnVLMConfig, input_ids, attn,
                   images, rows, at_pos, starts, steps, temps, top_ps,
                   row_keys, cur_token, cur_waypoint, finished,
                   start_vals, new_keys, new_temps, new_top_ps,
                   eos_token_id, frame_map,
                   *, s1: int, attn_impl: str, kv_quant: Optional[str]):
    """`_join_jit` for n simultaneous requests in ONE dispatch.

    The n prompts are LEFT-padded to a shared bucket and prefilled as one
    B=n batch (one CLIP encode, one set of prompt GEMMs, one tunnel
    round-trip instead of n), with per-row rotary positions derived from
    the post-splice mask (prefill positions_from_mask) so every row's
    stream stays position/rng-EXACT vs its solo decode. Each row's KV
    plane is independent, so ALL n prompts splice into the SAME cursor
    span [at_pos, at_pos+s1) of their own planes — a burst join consumes
    ONE prompt bucket of the shared cursor instead of n (less
    fragmentation => longer decode budget; the serial-join capacity model
    burned a bucket per request, VERDICT r3 #3). Returns the updated
    state + packed (n, 6) host sync [token, waypoint(4), finished]."""
    n = input_ids.shape[0]
    last_hidden, pcache, _ = prefill(
        params, cfg, input_ids, images, s1, attn_mask=attn,
        attn_impl=attn_impl, frame_map=frame_map, positions_from_mask=True)
    if kv_quant == "int8":
        pcache = quantize_kv_cache(pcache)
        k, v, ks, vs = cache.k, cache.v, cache.ks, cache.vs
        for r in range(n):
            row = rows[r]
            k = jax.lax.dynamic_update_slice(
                k, pcache.k[:, r:r + 1], (0, row, at_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(
                v, pcache.v[:, r:r + 1], (0, row, at_pos, 0, 0))
            ks = jax.lax.dynamic_update_slice(
                ks, pcache.ks[:, r:r + 1], (0, row, 0, at_pos))
            vs = jax.lax.dynamic_update_slice(
                vs, pcache.vs[:, r:r + 1], (0, row, 0, at_pos))
        cache = dataclasses.replace(cache, k=k, v=v, ks=ks, vs=vs)
    else:
        k, v = cache.k, cache.v
        for r in range(n):
            row = rows[r]
            k = jax.lax.dynamic_update_slice(
                k, pcache.k[:, r:r + 1].astype(k.dtype), (0, row, at_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(
                v, pcache.v[:, r:r + 1].astype(v.dtype), (0, row, at_pos, 0, 0))
        cache = dataclasses.replace(cache, k=k, v=v)
    cache = dataclasses.replace(
        cache, index=jnp.asarray(at_pos + s1).astype(jnp.int32))

    keys0 = jax.vmap(lambda key: jax.random.fold_in(key, 0))(new_keys)
    r_tok = jax.vmap(lambda key: jax.random.split(key)[0])(keys0)
    r_hand = jax.vmap(lambda key: jax.random.split(key)[1])(keys0)
    logits = lm_logits(
        params["llama"], cfg.llama, last_hidden[:, None, :])[:, 0]
    token = _row_sample(r_tok, logits, new_temps, new_top_ps)
    waypoint = jax.vmap(
        lambda key, hr: decode_hand_waypoint(params, cfg, hr[None], key)[0]
    )(r_hand, last_hidden).astype(jnp.float32)
    fin = token == eos_token_id

    starts = starts.at[rows].set(start_vals.astype(starts.dtype))
    steps = steps.at[rows].set(1)
    temps = temps.at[rows].set(new_temps.astype(temps.dtype))
    top_ps = top_ps.at[rows].set(new_top_ps.astype(top_ps.dtype))
    row_keys = row_keys.at[rows].set(new_keys.astype(row_keys.dtype))
    cur_token = cur_token.at[rows].set(token.astype(cur_token.dtype))
    cur_waypoint = cur_waypoint.at[rows].set(waypoint)
    finished = finished.at[rows].set(fin)
    packed = jnp.concatenate([
        token[:, None].astype(jnp.float32),
        waypoint.reshape(n, 4),
        fin[:, None].astype(jnp.float32),
    ], axis=1)
    return (cache, starts, steps, temps, top_ps, row_keys, cur_token,
            cur_waypoint, finished, packed)


@dataclasses.dataclass
class _Slot:
    busy: bool = False
    start: int = 0          # global slot of the prompt's first token
    max_new: int = 0
    seed: int = 0
    tokens: Optional[List[int]] = None
    wps: Optional[List[np.ndarray]] = None
    hands: Optional[List[bool]] = None
    done: bool = False


class ContinuousEngine:
    """Slot-based continuous decode over one persistent cache.

    Host API (all methods are chunk-boundary operations):
      can_admit(prompt_len) -> bool
      join(input_ids (1,Tp), images (1,F,3,H,W), seed, max_new) -> slot id
      step() -> list of (slot, SampleOutput) for requests finished this chunk
      idle() -> True when no slot is busy
    """

    def __init__(self, params, cfg: HandsOnVLMConfig, *, slots: int = 4,
                 max_len: int = 2048, chunk: int = 8,
                 temperature: float = 0.5, top_p: float = 0.9,
                 attn_impl: str = "auto", kv_quant: Optional[str] = None,
                 eos_token_id: int = EOS_TOKEN_ID):
        self.params = params
        self.cfg = cfg
        self.b = slots
        self.s = max_len
        self.chunk = chunk
        self.temperature = temperature
        self.top_p = top_p
        self.attn_impl = attn_impl
        self.kv_quant = kv_quant
        self.eos = eos_token_id

        # same dtype rule as prefill(): the cache holds activations, so it
        # follows the embedding table's dtype (bf16 on TPU, f32 CPU tests)
        dtype = params["llama"]["embed"]["weight"].dtype
        lc = cfg.llama
        shape = (lc.num_layers, slots, max_len, lc.kv_heads, lc.head_dim_)
        if kv_quant == "int8":
            # build the empty quant cache directly (quantizing a zeros bf16
            # cache would materialize throwaway fp32 temporaries — the
            # freed-memory leak, CLAUDE.md); scales 1.0 dequant the zeros
            self.cache = QuantKVCache(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                ks=jnp.ones((lc.num_layers, slots, lc.kv_heads, max_len),
                            jnp.float32),
                vs=jnp.ones((lc.num_layers, slots, lc.kv_heads, max_len),
                            jnp.float32),
                index=jnp.zeros((), jnp.int32),
            )
        else:
            self.cache = KVCache.create(cfg.llama, slots, max_len, dtype)
        self.pos = 0  # host mirror of cache.index
        self.mask = np.zeros((slots, max_len), bool)
        # per-row decode settings (traced, not static: serving sees arbitrary
        # user floats and must not recompile per value)
        self.temps = jnp.full((slots,), temperature, jnp.float32)
        self.top_ps = jnp.full((slots,), top_p, jnp.float32)
        self.starts = jnp.zeros((slots,), jnp.int32)
        self.steps = jnp.ones((slots,), jnp.int32)
        self.row_keys = jnp.stack(
            [jax.random.PRNGKey(0)] * slots)  # replaced per join
        self.cur_token = jnp.zeros((slots,), jnp.int32)
        self.cur_waypoint = jnp.zeros((slots, 2, 2), jnp.float32)
        self.finished = jnp.ones((slots,), bool)
        self.slots = [_Slot() for _ in range(slots)]
        self._last_compact_pos = -1  # skip re-planning when nothing changed
        self.compactions = 0  # successful defrag events (telemetry/tests)
        self.join_group_sizes: List[int] = []  # per-join n (telemetry/tests)

    # -- admission ----------------------------------------------------------

    def _bucket(self, prompt_len: int) -> int:
        # the transient prefill cache never feeds the stacked decode kernel
        # (decode runs over the persistent S-length cache, already a
        # multiple of 256), so the bucket only needs prefill's t_out+1
        # minimum, rounded to 128 to bound recompiles across prompt lengths
        t_out = prompt_len + self.cfg.num_visual_tokens - 1
        return -(-(t_out + 1) // 128) * 128

    def can_admit(self, prompt_len: int) -> bool:
        if not any(not s.busy for s in self.slots):
            return False
        # when every slot is idle, join() reclaims the cursor first — judge
        # capacity from 0, not from the dead cursor position
        pos = 0 if self.idle() else self.pos
        return pos + self._bucket(prompt_len) + self.chunk <= self.s

    def idle(self) -> bool:
        return not any(s.busy for s in self.slots)

    def join(self, input_ids, images, seed: int, max_new: int,
             temperature: Optional[float] = None,
             top_p: Optional[float] = None, frame_map=None) -> int:
        """Admit one request (caller must have checked can_admit).

        `temperature`/`top_p` override the engine defaults for THIS request
        only — each row samples with its own settings (`_row_sample`), so
        heterogeneous requests can share the decode batch. `frame_map` is
        the evaluator's dedup contract (InferenceEngine.dedup_frames):
        `images` holds only unique frames, the map scatters them back."""
        temperature = self.temperature if temperature is None else temperature
        top_p = self.top_p if top_p is None else top_p
        if self.idle() and self.pos > 0:
            # every plane is dead — reclaim the whole cursor range
            self.pos = 0
            self.cache = dataclasses.replace(
                self.cache, index=jnp.zeros((), jnp.int32))
            self.mask[:] = False
        input_ids = np.asarray(input_ids)
        assert input_ids.shape[0] == 1
        t_out = input_ids.shape[1] + self.cfg.num_visual_tokens - 1
        s1 = self._bucket(input_ids.shape[1])
        row = next(i for i, s in enumerate(self.slots) if not s.busy)
        at = self.pos
        if at + s1 + self.chunk > self.s:
            raise RuntimeError("cache exhausted; check can_admit first")

        row_key = jax.random.PRNGKey(seed)
        # one dispatch does everything (prefill + splice + first token +
        # every row-state update) and one packed device_get syncs the host
        # — join used to burn ~8 tunnel round-trips on tiny updates, which
        # dominated burst serving's wall (docs/PERF_NOTES.md round 4)
        (self.cache, self.starts, self.steps, self.temps, self.top_ps,
         self.row_keys, self.cur_token, self.cur_waypoint, self.finished,
         packed) = _join_jit(
            self.params, self.cache, self.cfg, jnp.asarray(input_ids),
            jnp.asarray(images), row, at, row_key,
            self.starts, self.steps, self.temps, self.top_ps,
            self.row_keys, self.cur_token, self.cur_waypoint, self.finished,
            at + s1 - t_out, jnp.float32(temperature), jnp.float32(top_p),
            self.eos,
            None if frame_map is None else jnp.asarray(frame_map),
            s1=s1, attn_impl=self.attn_impl, kv_quant=self.kv_quant)

        # bookkeeping: cursor jumps past the prompt bucket for everyone;
        # only the joiner's mask covers the prompt span
        self.mask[row, :] = False
        self.mask[row, at:at + t_out] = True
        self.pos = at + s1

        packed = np.asarray(jax.device_get(packed))
        tok0 = int(packed[0])
        wp0 = packed[1:5].reshape(2, 2).astype(np.float32)
        self.slots[row] = _Slot(
            busy=True, start=at + s1 - t_out, max_new=max_new, seed=seed,
            tokens=[tok0], wps=[wp0],
            hands=[tok0 == self.cfg.hand_token_id], done=tok0 == self.eos)
        return row

    def join_many(self, requests) -> List[int]:
        """Admit n requests in ONE fused dispatch (scheduler burst path).

        Each request is a dict with input_ids (1,Tp), images, seed,
        max_new and optional temperature/top_p/frame_map. Prompts are
        LEFT-padded to the group's shared bucket (rotary positions stay
        per-row exact — prefill positions_from_mask) and ALL planes share
        one cursor span: the group consumes ONE prompt bucket, not n.
        Caller contract (scheduler._admit): n <= free slots, image and
        frame_map shapes match across the group, can_admit(max prompt
        len) was checked. n==1 delegates to join()."""
        self.join_group_sizes.append(len(requests))
        if len(requests) == 1:
            r = requests[0]
            return [self.join(r["input_ids"], r["images"], seed=r["seed"],
                              max_new=r["max_new"],
                              temperature=r.get("temperature"),
                              top_p=r.get("top_p"),
                              frame_map=r.get("frame_map"))]
        if self.idle() and self.pos > 0:
            self.pos = 0
            self.cache = dataclasses.replace(
                self.cache, index=jnp.zeros((), jnp.int32))
            self.mask[:] = False
        n = len(requests)
        id_rows = [np.asarray(r["input_ids"])[0] for r in requests]
        plens = [row.shape[0] for row in id_rows]
        p = max(plens)
        s1 = self._bucket(p)
        at = self.pos
        if at + s1 + self.chunk > self.s:
            raise RuntimeError("cache exhausted; check can_admit first")
        free = [i for i, s in enumerate(self.slots) if not s.busy]
        if len(free) < n:
            raise RuntimeError(f"{n} joins but only {len(free)} free slots")
        rows = free[:n]

        ids = np.zeros((n, p), np.int32)
        attn = np.zeros((n, p), bool)
        for i, row in enumerate(id_rows):
            ids[i, p - row.shape[0]:] = row
            attn[i, p - row.shape[0]:] = True
        images = jnp.concatenate(
            [jnp.asarray(r["images"]) for r in requests], axis=0)
        fmaps = [r.get("frame_map") for r in requests]
        frame_map = (None if fmaps[0] is None
                     else jnp.concatenate([jnp.asarray(m).reshape(1, -1)
                                           for m in fmaps], axis=0))
        temps = [self.temperature if r.get("temperature") is None
                 else r["temperature"] for r in requests]
        top_ps = [self.top_p if r.get("top_p") is None else r["top_p"]
                  for r in requests]
        t_outs = [pl + self.cfg.num_visual_tokens - 1 for pl in plens]
        new_keys = jnp.stack(
            [jax.random.PRNGKey(r["seed"]) for r in requests])

        (self.cache, self.starts, self.steps, self.temps, self.top_ps,
         self.row_keys, self.cur_token, self.cur_waypoint, self.finished,
         packed) = _join_many_jit(
            self.params, self.cache, self.cfg, jnp.asarray(ids),
            jnp.asarray(attn), images, jnp.asarray(rows, jnp.int32), at,
            self.starts, self.steps, self.temps, self.top_ps,
            self.row_keys, self.cur_token, self.cur_waypoint, self.finished,
            jnp.asarray([at + s1 - t for t in t_outs], jnp.int32),
            new_keys, jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ps, jnp.float32), self.eos, frame_map,
            s1=s1, attn_impl=self.attn_impl, kv_quant=self.kv_quant)

        t_pad = p + self.cfg.num_visual_tokens - 1
        for i, row in enumerate(rows):
            # left padding: row i's real span is the LAST t_outs[i] of the
            # group's [at, at + t_pad) splice window
            self.mask[row, :] = False
            self.mask[row, at + t_pad - t_outs[i]:at + t_pad] = True
        self.pos = at + s1

        packed = np.asarray(jax.device_get(packed))
        for i, row in enumerate(rows):
            tok0 = int(packed[i, 0])
            wp0 = packed[i, 1:5].reshape(2, 2).astype(np.float32)
            self.slots[row] = _Slot(
                busy=True, start=at + s1 - t_outs[i],
                max_new=requests[i]["max_new"], seed=requests[i]["seed"],
                tokens=[tok0], wps=[wp0],
                hands=[tok0 == self.cfg.hand_token_id],
                done=tok0 == self.eos)
        return rows

    # -- decode -------------------------------------------------------------

    def step(self):
        """One chunk of decode for every slot; returns finished requests."""
        if self.pos + self.chunk > self.s:
            raise RuntimeError("cache exhausted")
        # the chunk will write [pos, pos+chunk) for every row
        self.mask[:, self.pos:self.pos + self.chunk] = True
        (self.cache, self.cur_token, self.cur_waypoint, self.finished,
         self.steps, packed) = _chunk_jit(
            self.params, self.cache, jnp.asarray(self.mask), self.starts,
            self.steps, self.row_keys, self.cur_token, self.cur_waypoint,
            self.finished, self.temps, self.top_ps, self.cfg,
            k=self.chunk, attn_impl=self.attn_impl, eos_token_id=self.eos)
        self.pos += self.chunk
        packed = np.asarray(jax.device_get(packed))  # ONE tunnel round-trip
        tokens = packed[..., 0].astype(np.int32)
        wps = packed[..., 1:5].reshape(self.b, self.chunk, 2, 2)
        hands = packed[..., 5] > 0.5

        done = []
        for r, slot in enumerate(self.slots):
            if not slot.busy:
                continue
            for i in range(self.chunk):
                if slot.done or len(slot.tokens) >= slot.max_new:
                    break
                tok = int(tokens[r, i])
                slot.tokens.append(tok)
                slot.wps.append(wps[r, i])
                slot.hands.append(bool(hands[r, i]))
                if tok == self.eos:
                    slot.done = True
            if slot.done or len(slot.tokens) >= slot.max_new:
                done.append((r, self._finalize(slot)))
                self.slots[r] = _Slot()
        return done

    def compact(self) -> int:
        """Block-aligned defragmentation: pull every live row's valid cache
        blocks toward the front and reclaim the cursor slack (the dead
        prompt buckets of finished requests and the pad each join burned
        into the other rows' planes).

        Mechanism: delete the same number h of fully-invalid cache blocks
        from every live row (h = the minimum headroom across rows,
        ops/cache_ops.count_removable_blocks) and pull the shared cursor
        back by h * block_k. Valid blocks keep their content, lane masks,
        and relative order, and every row's future writes stay congruent
        mod block_k — so the decode kernel's compacted block sweep sees
        bit-identical inputs and a row's continued generation is BIT-EQUAL
        across the event (tests/test_continuous_compact.py). Rotary
        continuity: positions are `index - starts`, and both shift by the
        same delta.

        Returns the number of cursor positions reclaimed (0 = not worth a
        cache rewrite, or nothing changed since the last failed attempt).
        Cost: one whole-block DMA pass over the cache (in-place, aliased —
        no second cache allocation; ops/cache_ops.gather_cache_blocks).
        """
        if self.idle():
            reclaimed = self.pos
            if reclaimed:
                self.pos = 0
                self.cache = dataclasses.replace(
                    self.cache, index=jnp.zeros((), jnp.int32))
                self.mask[:] = False
            return reclaimed
        if self.pos == self._last_compact_pos:
            return 0
        from handsonvlm_tpu.ops.cache_ops import (
            build_row_table,
            count_removable_blocks,
            gather_cache_blocks,
        )
        from handsonvlm_tpu.ops.decode_attention import (
            DEFAULT_BLOCK_K,
            _pick_stacked_block,
        )

        bk = _pick_stacked_block(self.s, min(DEFAULT_BLOCK_K, self.s))
        if self.s % bk:
            return 0  # no block-aligned view of this cache length
        nk = self.s // bk
        pos = min(self.pos, self.s)
        h = min(
            (count_removable_blocks(self.mask[r], pos, bk)
             for r in range(self.b) if self.slots[r].busy),
            default=0,
        )
        reclaimed = h * bk
        if reclaimed < self.chunk:
            self._last_compact_pos = self.pos
            return 0
        tables = np.tile(np.arange(nk, dtype=np.int32), (self.b, 1))
        new_mask = np.zeros_like(self.mask)
        for r in range(self.b):
            if not self.slots[r].busy:
                continue  # plane is dead: identity blocks, empty mask
            tables[r], new_mask[r] = build_row_table(self.mask[r], pos, bk,
                                                     nk, h)
        new_len = self.pos - reclaimed

        tj = jnp.asarray(tables)
        k2 = gather_cache_blocks(self.cache.k, tj, block_k=bk)
        v2 = gather_cache_blocks(self.cache.v, tj, block_k=bk)
        if self.kv_quant == "int8":
            ks2 = gather_cache_blocks(self.cache.ks, tj, block_k=bk,
                                      seq_axis=3)
            vs2 = gather_cache_blocks(self.cache.vs, tj, block_k=bk,
                                      seq_axis=3)
            self.cache = dataclasses.replace(
                self.cache, k=k2, v=v2, ks=ks2, vs=vs2,
                index=jnp.asarray(new_len, jnp.int32))
        else:
            self.cache = dataclasses.replace(
                self.cache, k=k2, v=v2,
                index=jnp.asarray(new_len, jnp.int32))
        delta = new_len - self.pos  # negative shift of the global cursor
        self.starts = self.starts + jnp.asarray(delta, jnp.int32)
        for slot in self.slots:
            if slot.busy:
                slot.start += delta
        self.mask = new_mask
        self.pos = new_len
        self.compactions += 1
        return reclaimed

    def drain(self):
        """Finalize every busy slot with what it has (host-side only; no
        device work). Used when the shared cursor is about to exhaust while
        rows are still live — their generations come back truncated. Proper
        capacity planning (`max_len` >= slots * prompt bucket + decode
        budget) makes this a last resort, not a steady state."""
        done = []
        for r, slot in enumerate(self.slots):
            if slot.busy:
                done.append((r, self._finalize(slot)))
                self.slots[r] = _Slot()
        return done

    def _finalize(self, slot: _Slot) -> SampleOutput:
        n = len(slot.tokens)
        toks = np.full((1, slot.max_new), PAD_TOKEN_ID, np.int32)
        toks[0, :n] = slot.tokens
        pred = np.zeros((1, MAX_HAND_STEPS, 2, 2), np.float32)
        nh = 0
        for j, is_hand in enumerate(slot.hands):
            if is_hand and nh < MAX_HAND_STEPS:
                pred[0, nh] = slot.wps[j]
                nh += 1
        return SampleOutput(
            sequences=toks,
            num_tokens=np.asarray([n], np.int32),
            pred_hands=np.ascontiguousarray(pred.transpose(0, 2, 1, 3)),
            num_hands=np.asarray([nh], np.int32),
        )
