"""N-gram speculative decoding (prompt/history/bank lookup, B=1 latency mode).

Decode cost at int4 7B is weight streaming (~8 ms of a ~10 ms step), paid
once per token in the sequential loop. Speculation amortizes it: draft K
candidate tokens from an n-gram match over (template bank + prompt +
generated-so-far), run ONE cached forward over K+1 positions (same weight
traffic as a single-token step), and accept a prefix via rejection
sampling, emitting 1..K+1 tokens per forward.

Correctness:
- Rejection sampling against the warped (temperature + top-p) distribution
  preserves the target sampling distribution exactly for a deterministic
  (point-mass) draft: accept d with prob p(d), else resample from p
  restricted to tokens != d. Greedy (temperature<=0) degenerates to
  accept-iff-argmax, making speculative output IDENTICAL to sequential
  greedy decode (tested).
- Acceptance truncates at the first emitted <hand_traj> or EOS: positions
  AFTER a hand token need the CVAE waypoint coordinate added to their
  input embedding (models/handsonvlm.py:embed_next_token), which a plain
  token draft cannot provide. Cache rows written beyond the accepted
  prefix are stale but never read (attention masks by the rewound index)
  and are overwritten by the next forward.
- The reference has no speculative path (it re-encodes the full prefix per
  token, handsonvlm.py:543-647); this is a TPU-native extension with exact
  sampling semantics.

Drafting: latest bigram match. The optional `bank_ids` (e.g. tokenized
answer templates from handsonvlm/constants.py — the model was TRAINED to
emit these template sentences) is prepended to the search buffer so even
the first generation of a template sentence finds long drafts.
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
)
from handsonvlm_tpu.models.llama import KVCache, apply_llama, lm_logits
from handsonvlm_tpu.infer.sampler import (
    EOS_TOKEN_ID,
    MAX_HAND_STEPS,
    PAD_TOKEN_ID,
    SampleOutput,
    _first_token,
    _prefill_jit,
    _round_cache_len,
    _warp_logits,
)


def ngram_draft(
    buf: jnp.ndarray,  # (L,) int32 search buffer (bank + prompt + generated)
    buf_len,  # scalar int32: filled length
    t_prev,
    t_cur,  # the current bigram context
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Latest i with buf[i:i+2] == (t_prev, t_cur) and room after it;
    returns (draft = buf[i+2 : i+2+k] (k,), found). Unfilled/overrun slots
    draft PAD (naturally rejected)."""
    L = buf.shape[0]
    idx = jnp.arange(L)
    nxt = jnp.roll(buf, -1)
    hit = (buf == t_prev) & (nxt == t_cur) & ((idx + 2) < buf_len)
    found = hit.any()
    latest = jnp.where(found, L - 1 - jnp.argmax(jnp.flip(hit)), 0)
    start = latest + 2
    pos = start + jnp.arange(k)
    draft = jnp.where(pos < buf_len, buf[jnp.clip(pos, 0, L - 1)], PAD_TOKEN_ID)
    return jnp.where(found, draft, PAD_TOKEN_ID), found


def spec_verify(
    rng: jax.Array,
    logits: jnp.ndarray,  # (k+1, V) raw logits for positions 0..k
    draft: jnp.ndarray,  # (k,) drafted tokens entering positions 1..k
    temperature: float,
    top_p: float,
    hand_token_id: int,
    eos_token_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (emitted (k+1,), n_emit). emitted[:n_emit] are the tokens
    produced by this forward (garbage beyond); n_emit in 1..k+1.

    Position i's logits sample the token entering position i+1. Draft d_i
    is accepted with prob p_i(d_i) (1 iff argmax for greedy); the first
    rejection resamples from p_i excluding d_i; full acceptance appends a
    bonus token from position k. Emission then truncates after the first
    <hand_traj>/EOS (see module docstring)."""
    k = draft.shape[0]
    if temperature <= 0.0:
        target = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (k+1,)
        accept = target[:k] == draft
        fallback = target[:k]
        bonus = target[k]
    else:
        warped = _warp_logits(logits, temperature, top_p)  # (k+1, V) -inf tails
        probs = jax.nn.softmax(warped, axis=-1)
        rngs = jax.random.split(rng, 2 * k + 1)
        u = jax.vmap(jax.random.uniform)(rngs[:k])  # (k,)
        p_draft = jnp.take_along_axis(probs[:k], draft[:, None], axis=1)[:, 0]
        accept = u < p_draft
        masked = jnp.where(
            jax.nn.one_hot(draft, logits.shape[-1], dtype=bool), -jnp.inf, warped[:k]
        )
        fallback = jax.vmap(jax.random.categorical)(rngs[k : 2 * k], masked)
        fallback = fallback.astype(jnp.int32)
        bonus = jax.random.categorical(rngs[2 * k], warped[k]).astype(jnp.int32)

    acc_prefix = jnp.cumprod(accept.astype(jnp.int32)) == 1  # (k,) all accepted so far
    j = jnp.sum(acc_prefix)  # first reject index; k if none
    slot = jnp.arange(k + 1)
    emitted = jnp.where(
        slot < j,
        jnp.concatenate([draft, jnp.zeros((1,), draft.dtype)]),
        jnp.where(
            slot == j,
            jnp.concatenate([jnp.where(acc_prefix, 0, fallback), bonus[None]])[
                jnp.clip(j, 0, k)
            ],
            0,
        ),
    ).astype(jnp.int32)
    n_raw = j + 1
    stop = (emitted == hand_token_id) | (emitted == eos_token_id)
    stop = stop & (slot < n_raw)
    first_stop = jnp.where(stop.any(), jnp.argmax(stop), n_raw)
    n_emit = jnp.minimum(n_raw, first_stop + 1)
    return emitted, n_emit


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "k", "iters", "max_new_tokens", "temperature", "top_p",
        "eos_token_id", "attn_impl", "skip_cond",
    ),
)
def spec_chunk(
    params,
    cfg: HandsOnVLMConfig,
    cache: KVCache,
    cache_mask: jnp.ndarray,
    state: dict,
    rng: jax.Array,
    *,
    k: int,
    iters: int,
    max_new_tokens: int,
    temperature: float,
    top_p: float,
    eos_token_id: int,
    attn_impl: str,
    skip_cond: bool = False,
):
    """`iters` speculative forwards in one dispatch (fori_loop), each
    emitting 1..k+1 tokens. B=1.

    `skip_cond` removes the finished-early-exit lax.cond around the body:
    a cond over a cache-carrying state breaks in-place cache aliasing
    (copy-unification — the CLAUDE.md decode-loop trap), taxing EVERY
    iteration to save only the overshoot ones. Callers that bound `iters`
    to the tokens actually remaining (the gated k=0 continuation) pay no
    overshoot and should skip the cond."""
    embed_table = params["llama"]["embed"]["weight"]

    def body(_, carry):
        if skip_cond:
            return _active_body(carry)
        # finished iterations skip the whole forward via lax.cond — a chunk
        # that overshoots EOS costs dispatch only, not 7B weight streams
        return jax.lax.cond(carry[1]["finished"], lambda c: c, _active_body, carry)

    def _active_body(carry):
        cache, state, rng = carry
        rng, r_v, r_w = jax.random.split(rng, 3)
        draft, found = ngram_draft(
            state["buf"], state["buf_len"], state["prev_tok"], state["cur_tok"], k
        )
        e0 = embed_next_token(
            params, cfg, state["cur_tok"][None], state["cur_wp"][None]
        )  # (1, D)
        embs = jnp.concatenate([e0, embed_table[draft]], axis=0)[None]  # (1,k+1,D)
        hidden, cache2 = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=embs,
            attn_mask=cache_mask, kv_cache=cache, attn_impl=attn_impl,
            lora=params.get("lora"),
        )
        logits = lm_logits(params["llama"], cfg.llama, hidden)[0]  # (k+1, V)
        emitted, n_emit = spec_verify(
            r_v, logits.astype(jnp.float32), draft, temperature, top_p,
            cfg.hand_token_id, eos_token_id,
        )

        fin = state["finished"]
        n_eff = jnp.where(fin, 0, n_emit)
        last = jnp.clip(n_eff - 1, 0, k)

        # ONE waypoint decode per forward: emission truncates after the
        # first <hand_traj> (spec_verify), so a hand token — the only
        # position whose waypoint is ever read — can only sit at the LAST
        # emitted position; decoding all k+1 positions was 5x wasted CVAE
        # work per forward.
        h_last = jax.lax.dynamic_index_in_dim(hidden[0], last, 0, keepdims=False)
        wp_last = decode_hand_waypoint(params, cfg, h_last[None], r_w)[0].astype(
            jnp.float32
        )  # (2, 2)

        tokens = jax.lax.dynamic_update_slice(
            state["tokens"], emitted, (state["n_tokens"],)
        )
        buf = jax.lax.dynamic_update_slice(state["buf"], emitted, (state["buf_len"],))

        pred_hands, num_hands = state["pred_hands"], state["num_hands"]
        is_hand = (emitted[last] == cfg.hand_token_id) & (n_eff > 0)
        slot = jnp.clip(num_hands, 0, MAX_HAND_STEPS - 1)
        pred_hands = jnp.where(
            is_hand, pred_hands.at[slot].set(wp_last), pred_hands
        )
        num_hands = num_hands + is_hand.astype(jnp.int32)

        new_cur = jnp.where(fin, state["cur_tok"], emitted[last])
        new_prev = jnp.where(
            fin,
            state["prev_tok"],
            jnp.where(n_eff >= 2, emitted[jnp.clip(n_eff - 2, 0, k)], state["cur_tok"]),
        )
        new_wp = jnp.where(fin, state["cur_wp"], wp_last)
        hit_eos = ((emitted == eos_token_id) & (jnp.arange(k + 1) < n_eff)).any()
        n_tokens = state["n_tokens"] + n_eff
        finished = fin | hit_eos | (n_tokens >= max_new_tokens)

        # rebuild with the SAME cache type: with kv_quant="int8" cache2 is a
        # QuantKVCache (k/v int8 + ks/vs scales); constructing a plain
        # KVCache here made the lax.cond branches return different pytree
        # structures (trace-time TypeError) and dropped the scales.
        cache = dataclasses.replace(cache2, index=cache.index + n_eff)
        new_state = dict(
            state,
            buf=buf, buf_len=state["buf_len"] + n_eff,
            prev_tok=new_prev, cur_tok=new_cur, cur_wp=new_wp,
            tokens=tokens, n_tokens=n_tokens,
            pred_hands=pred_hands, num_hands=num_hands, finished=finished,
            iters=state["iters"] + jnp.where(fin, 0, 1),
            drafts_found=state["drafts_found"] + jnp.where(fin | ~found, 0, 1),
            # acceptance-length histogram: bucket i counts forwards that
            # emitted i tokens (telemetry for acceptance-vs-temperature
            # analysis, tools/perf_spec_acceptance.py)
            accept_hist=state["accept_hist"].at[jnp.clip(n_eff, 0, k + 1)].add(
                jnp.where(fin, 0, 1)),
        )
        return cache, new_state, rng

    cache, state, rng = jax.lax.fori_loop(0, iters, body, (cache, state, rng))
    # pack the host sync into ONE tiny array: device_get of a (finished,
    # n_tokens, iters) tuple costs three sequential ~35 ms tunnel round
    # trips (tree_map transfers leaves one by one — CLAUDE.md)
    sync = jnp.stack([
        state["finished"].astype(jnp.float32),
        state["n_tokens"].astype(jnp.float32),
        state["iters"].astype(jnp.float32),
    ])
    return cache, state, rng, sync


@jax.jit
def _pack_final(state):
    """Flatten the host-bound end-of-generate state into ONE f32 vector
    (token ids < 2^24 are exact in f32): one tunnel round trip instead of
    seven. Layout: tokens | pred_hands.flat | accept_hist | [n_tokens,
    num_hands, iters, drafts_found]."""
    return jnp.concatenate([
        state["tokens"].astype(jnp.float32),
        state["pred_hands"].astype(jnp.float32).reshape(-1),
        state["accept_hist"].astype(jnp.float32),
        jnp.stack([
            state["n_tokens"].astype(jnp.float32),
            state["num_hands"].astype(jnp.float32),
            state["iters"].astype(jnp.float32),
            state["drafts_found"].astype(jnp.float32),
        ]),
    ])


def generate_spec(
    params,
    cfg: HandsOnVLMConfig,
    input_ids,  # (1, T) with IMAGE sentinel
    images,
    rng: jax.Array,
    *,
    max_new_tokens: int = 100,
    k: int = 4,
    chunk_iters: int = 8,
    temperature: float = 0.5,
    top_p: float = 0.9,
    eos_token_id: int = EOS_TOKEN_ID,
    attn_impl: str = "auto",
    attn_mask=None,  # (1, T) valid-prompt mask for LEFT-padded prompts
    frame_map=None,
    bank_ids: Optional[jnp.ndarray] = None,  # (N,) template-bank tokens
    max_len: int = 0,
    on_token=None,
    kv_quant=None,  # "int8": quantized decode cache (models/llama.QuantKVCache)
    gate_tok_per_fwd: float = 1.2,
    probe_iters: int = 8,
):
    """Speculative generate, B=1. Returns (SampleOutput, stats dict with
    'iters' forwards and 'drafts_found'). Sampling distribution matches
    generate/generate_chunked exactly (greedy: token-identical).

    `on_token` (token_id -> None) streams tokens in bursts after each
    chunk dispatch (up to chunk_iters*(k+1) tokens per burst; lower
    `chunk_iters` for finer-grained streaming).

    Acceptance gate: a K-token verify forward streams the same weights as
    a 1-token step but computes K+1 positions, so speculation only wins
    when drafts actually get accepted — at the eval temperature with a
    model that does NOT match the template bank, measured acceptance is
    1.04-1.11 tok/fwd and --spec made eval SLOWER (BENCH_r03; with a
    matched bank it is 1.78, tools/perf_spec_acceptance.py). The first
    `probe_iters` forwards run speculatively; if they emitted fewer than
    `gate_tok_per_fwd` tokens per forward, the remaining decode continues
    with k=0 — which IS sequential decode in this loop (empty draft, one
    position per forward, identical sampling semantics and state), so the
    fallback reuses the cache and state with zero re-work.
    `gate_tok_per_fwd=0` disables the gate (one-dispatch fast path).

    Without `on_token` and with the gate off, the whole decode runs as ONE
    spec_chunk dispatch: every forward emits >=1 token, so
    `max_new_tokens` iterations always suffice, and finished iterations
    skip the weight streams via lax.cond (they cost loop arithmetic only).
    Chunked dispatch pays ~30 ms of tunnel latency per host sync
    (CLAUDE.md), which at ~5 chunks was ~40% of the 64-token decode wall."""
    import numpy as np

    input_ids = jnp.asarray(input_ids)
    assert input_ids.shape[0] == 1, "speculative decode is the B=1 latency mode"
    t_prompt = input_ids.shape[1] + cfg.num_visual_tokens - 1
    if max_len == 0:
        max_len = _round_cache_len(t_prompt + max_new_tokens + k + 2)

    last_hidden, cache, cache_mask = _prefill_jit(
        params, cfg, input_ids, jnp.asarray(images), max_len, attn_impl,
        None if attn_mask is None else jnp.asarray(attn_mask),
        None if frame_map is None else jnp.asarray(frame_map),
        kv_quant=kv_quant,
    )
    rng, r0 = jax.random.split(rng)
    token, waypoint = _first_token(
        params, cfg, last_hidden, r0, temperature=temperature, top_p=top_p
    )
    tok0 = jnp.asarray(token[0], jnp.int32)
    wp0 = waypoint[0].astype(jnp.float32)

    row = np.asarray(input_ids[0])
    if attn_mask is not None:
        row = row[np.asarray(attn_mask[0], bool)]  # drop left-pad bucket slots
    prompt_row = jnp.asarray(np.where(row < 0, PAD_TOKEN_ID, row), jnp.int32)
    bank = (
        jnp.asarray(bank_ids, jnp.int32)
        if bank_ids is not None else jnp.zeros((0,), jnp.int32)
    )
    buf_cap = int(bank.shape[0] + prompt_row.shape[0] + max_new_tokens + k + 2)
    buf = jnp.zeros((buf_cap,), jnp.int32)
    buf = buf.at[: bank.shape[0]].set(bank)
    buf = buf.at[bank.shape[0] : bank.shape[0] + prompt_row.shape[0]].set(prompt_row)
    buf_len0 = bank.shape[0] + prompt_row.shape[0]

    # record the first token (sampled from prefill) like the other loops
    acc_cap = max_new_tokens + k + 1
    state = {
        "buf": jax.lax.dynamic_update_slice(buf, tok0[None], (buf_len0,)),
        "buf_len": jnp.asarray(buf_len0 + 1, jnp.int32),
        "prev_tok": prompt_row[-1],
        "cur_tok": tok0,
        "cur_wp": wp0,
        "tokens": jnp.zeros((acc_cap,), jnp.int32).at[0].set(tok0),
        "n_tokens": jnp.asarray(1, jnp.int32),
        "pred_hands": jnp.zeros((MAX_HAND_STEPS, 2, 2), jnp.float32),
        "num_hands": jnp.asarray(0, jnp.int32),
        "finished": jnp.asarray(False),
        "iters": jnp.asarray(0, jnp.int32),
        "drafts_found": jnp.asarray(0, jnp.int32),
        "accept_hist": jnp.zeros((k + 2,), jnp.int32),
    }
    is_hand0 = tok0 == cfg.hand_token_id
    state["pred_hands"] = jnp.where(
        is_hand0, state["pred_hands"].at[0].set(wp0), state["pred_hands"]
    )
    state["num_hands"] = state["num_hands"] + is_hand0.astype(jnp.int32)
    state["finished"] = tok0 == eos_token_id

    if on_token is not None and not bool(jax.device_get(state["finished"])):
        on_token(int(tok0))
    gating = gate_tok_per_fwd > 0 and probe_iters > 0 and k > 0
    if on_token is None:
        # non-streaming: one dispatch covers the worst case (1 token/fwd);
        # with the gate on, the probe chunk is its own (small) dispatch
        chunk_iters = max(chunk_iters, max_new_tokens)
    k_run = k
    gated = False
    streamed = 1
    first_chunk = True
    n_now = 1
    while True:
        rng, r_chunk = jax.random.split(rng)
        if gating and first_chunk:
            # probe: bounded overshoot (<= probe_iters-1 forwards after an
            # early EOS), so the cond's per-iteration aliasing tax is the
            # worse deal — skip it
            iters, sk = probe_iters, True
        elif gated and on_token is None:
            # k=0 emits exactly 1 token per forward: the remaining-token
            # count IS the exact iteration bound — zero overshoot, cond-free
            iters, sk = max(1, max_new_tokens - n_now), True
        elif gated:
            iters, sk = chunk_iters, True  # streaming: overshoot <= chunk
        else:
            # speculative continuation: acceptance makes iters=max_new an
            # overshooting bound — the cond's skip pays for itself here
            iters, sk = chunk_iters, False
        cache, state, _, sync = spec_chunk(
            params, cfg, cache, cache_mask, state, r_chunk,
            k=k_run, iters=iters, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p,
            eos_token_id=eos_token_id, attn_impl=attn_impl, skip_cond=sk,
        )
        # ONE host round trip per chunk (packed in-program; CLAUDE.md)
        sync = np.asarray(jax.device_get(sync))
        done, n_now, n_fwd = bool(sync[0]), int(sync[1]), int(sync[2])
        if gating and first_chunk and not done and n_fwd > 0:
            # probe verdict: below the break-even acceptance, continue the
            # SAME loop with k=0 (sequential cost, identical semantics)
            rate = (n_now - 1) / n_fwd
            if rate < gate_tok_per_fwd:
                k_run = 0
                gated = True
        first_chunk = False
        if on_token is not None and n_now > streamed:
            # fetch the whole (tiny) token buffer and slice host-side: a
            # device-side dynamic_slice outside jit would compile a new
            # program per distinct burst length
            burst = np.asarray(jax.device_get(state["tokens"]))[
                streamed : min(n_now, max_new_tokens)
            ]
            for t_id in burst:
                if t_id == eos_token_id:
                    break
                on_token(int(t_id))
            streamed = n_now
        if done or n_now >= max_new_tokens:
            break

    # ONE packed round trip for everything the host needs: device_get of a
    # dict transfers leaves sequentially (~35 ms each — 7 trips, ~245 ms of
    # pure latency per generate call before this packing; CLAUDE.md)
    packed = np.asarray(jax.device_get(_pack_final(state)))
    acc_n = state["tokens"].shape[0]
    hist_n = state["accept_hist"].shape[0]
    fetched = {
        "tokens": packed[:acc_n].astype(np.int32),
        "pred_hands": packed[acc_n:acc_n + MAX_HAND_STEPS * 4].reshape(
            MAX_HAND_STEPS, 2, 2),
        "accept_hist": packed[acc_n + MAX_HAND_STEPS * 4:
                              acc_n + MAX_HAND_STEPS * 4 + hist_n
                              ].astype(np.int32),
        "n_tokens": int(packed[-4]),
        "num_hands": int(packed[-3]),
        "iters": int(packed[-2]),
        "drafts_found": int(packed[-1]),
    }
    n = min(int(fetched["n_tokens"]), max_new_tokens)
    tokens = np.asarray(fetched["tokens"])[:max_new_tokens]
    # EOS truncation: tokens after the first EOS are garbage slots
    seq = np.full((1, max_new_tokens), PAD_TOKEN_ID, np.int32)
    seq[0, :n] = tokens[:n]
    eos_pos = np.nonzero(seq[0] == eos_token_id)[0]
    if eos_pos.size:
        n = min(n, int(eos_pos[0]) + 1)
        seq[0, n:] = PAD_TOKEN_ID
    # host numpy out: consumers fetch immediately; round-tripping through
    # the device costs a tunnel transfer each way (see generate_chunked)
    out = SampleOutput(
        sequences=np.ascontiguousarray(seq),
        num_tokens=np.asarray([n], np.int32),
        pred_hands=np.ascontiguousarray(
            np.asarray(fetched["pred_hands"])[None].transpose(0, 2, 1, 3)
        ),
        num_hands=np.asarray([int(fetched["num_hands"])], np.int32),
    )
    stats = {
        "iters": int(fetched["iters"]),
        "drafts_found": int(fetched["drafts_found"]),
        "tokens": n,
        # accept_hist[i] = forwards that emitted i tokens (i=0 unused)
        "accept_hist": [int(x) for x in np.asarray(fetched["accept_hist"])],
        # acceptance gate fell back to k=0 (sequential-cost) decode
        "gated": gated,
    }
    return out, stats


def build_template_bank(tokenizer, cfg: HandsOnVLMConfig, narrations=()) -> "jnp.ndarray":
    """Tokenize the EK answer templates (handsonvlm/constants.py — the SFT
    answers are drawn from exactly these strings, epic_dataset.py:67,134)
    into one draft-search buffer. `narrations` optionally adds
    action-specific fills ("reach for the cup"). Templates are joined with
    EOS so bigrams never straddle two templates usefully."""
    import numpy as np

    from handsonvlm_tpu.constants import (
        ACTION_ANSWER_TEMPLATES,
        GENERAL_ANSWER_TEMPLATES,
        GENERAL_TRAJECTORY_ANSWER_TEMPLATES,
        HAND_TOKEN_TEMPLATE,
    )
    from handsonvlm_tpu.data.tokenization import tokenizer_image_token

    hand4 = " ".join([HAND_TOKEN_TEMPLATE] * 4)
    texts = []
    for t in GENERAL_TRAJECTORY_ANSWER_TEMPLATES + GENERAL_ANSWER_TEMPLATES:
        texts.append(t.format(hand4))
    for t in ACTION_ANSWER_TEMPLATES:
        for narr in narrations or ("",):
            texts.append(t.format(narr, hand4))
    rows = []
    for text in texts:
        ids = tokenizer_image_token(text, tokenizer)
        rows.extend(int(i) for i in ids if int(i) >= 0)
        rows.append(EOS_TOKEN_ID)
    return jnp.asarray(np.asarray(rows, np.int32))
