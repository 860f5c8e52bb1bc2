"""LLaMA/Vicuna decoder, TPU-first.

Functional re-design of the reference's HF `LlamaModel` path
(llava/model/language_model/llava_llama.py:30-140 builds on transformers
4.31 LLaMA). Parameters are a plain pytree with per-layer weights stacked on
a leading axis so the layer stack runs as one `lax.scan` (fast compiles,
scan-level `jax.checkpoint` rematerialisation replacing the reference's HF
`gradient_checkpointing True`, scripts/finetune.sh:37).

Numerics match HF LLaMA: RMSNorm(eps) in fp32, non-interleaved rotary
("rotate_half"), SwiGLU MLP, fp32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import LlamaConfig
from handsonvlm_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Preallocated decode cache: k,v of shape (L, B, S_max, K, D)."""

    k: jnp.ndarray
    v: jnp.ndarray
    index: jnp.ndarray  # scalar int32: number of valid positions

    def tree_flatten(self):
        return (self.k, self.v, self.index), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_len: int, dtype) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.kv_heads, cfg.head_dim_)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            index=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantKVCache:
    """int8 decode cache: k,v (L,B,S,K,D) int8 + per-(token, kv-head)
    scales ks,vs (L,B,K,S) f32 (scales laid out head-major so the decode
    kernel's (K, block_k) scale blocks are contiguous in S). Halves the
    dominant decode-attention DMA and the cache footprint; dequantization
    is exact per token (ops/decode_attention.decode_attention_stacked_q).
    Built from a bf16 cache INSIDE the prefill jit (quantize_kv_cache) —
    program-internal transients avoid this backend's freed-memory leak."""

    k: jnp.ndarray
    v: jnp.ndarray
    ks: jnp.ndarray
    vs: jnp.ndarray
    index: jnp.ndarray

    def tree_flatten(self):
        return (self.k, self.v, self.ks, self.vs, self.index), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def _quantize_kv_rows(x: jnp.ndarray):
    """(..., K, D) -> int8 values + f32 scales (..., K), exact per row."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.round(x.astype(jnp.float32) / sc[..., None])
    return jnp.clip(q8, -127, 127).astype(jnp.int8), sc


def quantize_kv_cache(cache: KVCache) -> QuantKVCache:
    k8, ks = _quantize_kv_rows(cache.k)  # scales (L,B,S,K)
    v8, vs = _quantize_kv_rows(cache.v)
    return QuantKVCache(
        k=k8, v=v8,
        ks=jnp.transpose(ks, (0, 1, 3, 2)),  # (L,B,K,S)
        vs=jnp.transpose(vs, (0, 1, 3, 2)),
        index=cache.index,
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_llama(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    """Random init (normal 0.02, like HF) — real weights come from convert/."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    h, k, hd, L = cfg.num_heads, cfg.kv_heads, cfg.head_dim_, cfg.num_layers
    keys = jax.random.split(rng, 10)

    def norm(key, shape, scale=0.02):
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    params = {
        "embed": {"weight": norm(keys[0], (cfg.padded_vocab_size, d))},
        "layers": {
            "attn": {
                "wq": norm(keys[1], (L, d, h * hd)),
                "wk": norm(keys[2], (L, d, k * hd)),
                "wv": norm(keys[3], (L, d, k * hd)),
                "wo": norm(keys[4], (L, h * hd, d)),
            },
            "mlp": {
                "w_gate": norm(keys[5], (L, d, f)),
                "w_up": norm(keys[6], (L, d, f)),
                "w_down": norm(keys[7], (L, f, d)),
            },
            "attn_norm": {"scale": jnp.ones((L, d), dtype)},
            "mlp_norm": {"scale": jnp.ones((L, d), dtype)},
        },
        "final_norm": {"scale": jnp.ones((d,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": norm(keys[8], (d, cfg.padded_vocab_size))}
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


REMAT_POLICIES = ("full", "dots", "dots_nobatch", "save_lora")


def _remat(fn, remat):
    """jax.checkpoint with a selectable save policy.

    remat: True/'full' = save nothing (recompute everything in backward —
    minimum memory, the reference recipe's gradient_checkpointing);
    'dots' = dots_saveable (keep matmul outputs, recompute elementwise —
    trades HBM for fewer recomputed MXU flops); 'dots_nobatch' =
    dots_with_no_batch_dims_saveable. Probed for the training-MFU sweep
    (tools/perf_train_step.py HANDSONVLM_REMAT)."""
    if remat is True or remat == "full":
        return jax.checkpoint(fn)
    if remat == "dots":
        return jax.checkpoint(fn, policy=jax.checkpoint_policies.dots_saveable)
    if remat == "dots_nobatch":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "save_lora":
        # 'full' + keep the tiny (..., r) adapter first-stage outputs
        # (models/lora checkpoint_name "lora_u"): the backward recompute
        # skips the x@A dots at ~1 MB/layer/target of residency
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names("lora_u"))
    raise ValueError(f"unknown remat policy {remat!r} (use {REMAT_POLICIES})")


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """HF-style rotary tables. positions: (B,T) -> cos/sin (B,T,head_dim)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B,T,hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)  # (B,T,hd)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B,T,H,D); cos/sin: (B,T,D). Non-interleaved rotate_half (HF)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + rotated * sin


def _layer(
    hidden: jnp.ndarray,
    lp,
    cfg: LlamaConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    q_offset,
    layer_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    cache_index: Optional[jnp.ndarray],
    attn_impl: str,
    lora_layer=None,
    lora_scale: float = 0.0,
    int4_stacked=None,
    layer_idx=None,
    stacked_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    tp_mesh=None,
    seq_mesh=None,
    int8_stacked=None,
):
    """One decoder block. Returns (hidden, (new_k_slice, new_v_slice)).

    With `stacked_kv` (decode fast path) the FULL (L,B,S,K,D) cache rides
    the scan carry: this layer's new kv is written as a single-row
    dynamic_update_slice (in-place on the carry) and attention reads the
    layer through a scalar-prefetched index_map
    (ops.decode_attention.decode_attention_stacked) — never XLA-slicing the
    layer out, which would materialize (B,S,K,D) copies per layer per step
    (measured 25-32 ms/step at 7B B=8; tools/perf_batch_step.py).

    With `int4_stacked` (the FULL stacked int4 projection tree, a scan
    constant) projections run through int4_matmul_stacked selecting
    `layer_idx` via scalar prefetch — scan-slicing quantized weights would
    make every pallas operand a materialized copy (3x HBM traffic,
    docs/PERF_NOTES.md)."""
    from handsonvlm_tpu.models.lora import lora_delta, lora_delta_multi
    from handsonvlm_tpu.ops.int8_matmul import int4_matmul_stacked, maybe_int8_matmul

    b, t, d = hidden.shape
    h, k, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim_

    def proj(x, name, grp="attn"):
        out = maybe_int8_matmul(x, lp[grp][name])
        return out + lora_delta(lora_layer, name, x, lora_scale)

    def proj8(x, name):
        # fused QLoRA path (ops/qlora_fused): stacked int8 base as a scan
        # constant; a targeted projection's low-rank delta is accumulated in
        # the kernel's output tile epilogue — the full-width f32 delta never
        # exists in HBM (the measured ~46 ms/step adapter tax at 7B,
        # docs/PERF_NOTES.md "Adapter-tax follow-ups")
        from handsonvlm_tpu.ops.qlora_fused import (
            int8_lora_matmul_stacked,
            int8_matmul_stacked,
        )

        leaf = int8_stacked[name]
        ad = (lora_layer[name]
              if lora_layer is not None and name in lora_layer else None)
        if ad is not None:
            return int8_lora_matmul_stacked(
                x, leaf["w8"], leaf["scale"], ad["a"], ad["b"],
                lora_scale, layer_idx)
        return int8_matmul_stacked(x, leaf["w8"], leaf["scale"], layer_idx)

    def iproj(x, name):
        leaf = int4_stacked[name]
        # tiled (w4t/gst, production) or flat (w4/gscale) packed layout
        w, g = (
            (leaf["w4t"], leaf["gst"]) if "w4t" in leaf
            else (leaf["w4"], leaf["gscale"])
        )
        if tp_mesh is not None:
            from handsonvlm_tpu.parallel.tp import int4_matmul_stacked_tp

            return int4_matmul_stacked_tp(x, w, g, layer_idx, mesh=tp_mesh)
        return int4_matmul_stacked(x, w, g, layer_idx)

    x = rms_norm(hidden, lp["attn_norm"]["scale"], cfg.rms_norm_eps)
    # qkv adapter deltas share the input x: lora_delta_multi can group
    # their sub-MXU dots (HANDSONVLM_LORA_GROUPED; split is the default —
    # grouping measured slower at 7B, docs/PERF_NOTES.md "Adapter-tax")
    dqkv = (None if int8_stacked is not None else
            lora_delta_multi(lora_layer, ("wq", "wk", "wv"), x, lora_scale))
    if int8_stacked is not None:
        q = proj8(x, "wq").reshape(b, t, h, hd)
        kx = proj8(x, "wk").reshape(b, t, k, hd)
        vx = proj8(x, "wv").reshape(b, t, k, hd)
    elif int4_stacked is not None:
        qkv = iproj(x, "wqkv")
        if isinstance(dqkv, tuple):
            q = qkv[..., : h * hd] + dqkv[0]
            kx = qkv[..., h * hd: (h + k) * hd] + dqkv[1]
            vx = qkv[..., (h + k) * hd:] + dqkv[2]
        else:
            qkv = qkv + dqkv
            q = qkv[..., : h * hd]
            kx = qkv[..., h * hd: (h + k) * hd]
            vx = qkv[..., (h + k) * hd:]
        q = q.reshape(b, t, h, hd)
        kx = kx.reshape(b, t, k, hd)
        vx = vx.reshape(b, t, k, hd)
    else:
        if not isinstance(dqkv, tuple):
            qh, kh = h * hd, k * hd
            dqkv = ((0.0, 0.0, 0.0) if isinstance(dqkv, float) else
                    (dqkv[..., :qh], dqkv[..., qh:qh + kh], dqkv[..., qh + kh:]))
        q = (maybe_int8_matmul(x, lp["attn"]["wq"]) + dqkv[0]).reshape(b, t, h, hd)
        kx = (maybe_int8_matmul(x, lp["attn"]["wk"]) + dqkv[1]).reshape(b, t, k, hd)
        vx = (maybe_int8_matmul(x, lp["attn"]["wv"]) + dqkv[2]).reshape(b, t, k, hd)
    q = apply_rope(q, cos, sin)
    kx = apply_rope(kx, cos, sin)

    if stacked_kv is not None:
        quant = len(stacked_kv) == 4  # int8 cache (QuantKVCache)
        if quant:
            ck, cv, cks, cvs = stacked_kv  # int8 (L,B,S,K,D) + f32 (L,B,K,S)
            k8, ksc = _quantize_kv_rows(kx)  # scales (B, t, K)
            v8, vsc = _quantize_kv_rows(vx)
            ck = jax.lax.dynamic_update_slice(
                ck, k8[None], (layer_idx, 0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v8[None], (layer_idx, 0, cache_index, 0, 0))
            cks = jax.lax.dynamic_update_slice(
                cks, jnp.transpose(ksc, (0, 2, 1))[None],
                (layer_idx, 0, 0, cache_index))
            cvs = jax.lax.dynamic_update_slice(
                cvs, jnp.transpose(vsc, (0, 2, 1))[None],
                (layer_idx, 0, 0, cache_index))
            new_kv = (ck, cv, cks, cvs)
        else:
            ck, cv = stacked_kv  # (L, B, S_max, K, D)
            ck = jax.lax.dynamic_update_slice(
                ck, kx[None].astype(ck.dtype), (layer_idx, 0, cache_index, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, vx[None].astype(cv.dtype), (layer_idx, 0, cache_index, 0, 0)
            )
            new_kv = (ck, cv)
        from handsonvlm_tpu.ops.decode_attention import (
            MAX_T_WINDOW,
            stacked_kernel_ok,
        )

        # t>1 windows (speculative verify, t = k+1) run through the same
        # kernel with per-row causal limits: the cache is DMA'd once per
        # WINDOW instead of being dequantized/materialized by XLA per
        # forward (the spec x kv8 traffic regression, docs/PERF_NOTES.md).
        use_kernel = (
            t <= MAX_T_WINDOW
            and attn_impl in ("auto", "decode")
            and hd % 8 == 0
            and stacked_kernel_ok(ck.shape[2])
        )
        if use_kernel:
            # one dispatch covers t == 1 decode and 1 < t <= MAX_T_WINDOW
            # verify windows: length is cache_index + t either way, and the
            # kernel applies per-row causal limits when t > 1
            if quant and tp_mesh is not None:
                from handsonvlm_tpu.parallel.tp import (
                    decode_attention_stacked_q_tp,
                )

                out = decode_attention_stacked_q_tp(
                    q, ck, cv, cks, cvs, layer_idx, cache_index + t,
                    key_mask=key_mask, mesh=tp_mesh,
                )
            elif quant:
                from handsonvlm_tpu.ops.decode_attention import (
                    decode_attention_stacked_q,
                )

                out = decode_attention_stacked_q(
                    q, ck, cv, cks, cvs, layer_idx, cache_index + t,
                    key_mask=key_mask,
                )
            elif tp_mesh is not None:
                from handsonvlm_tpu.parallel.tp import (
                    decode_attention_stacked_tp,
                )

                out = decode_attention_stacked_tp(
                    q, ck, cv, layer_idx, cache_index + t, key_mask=key_mask,
                    mesh=tp_mesh,
                )
            else:
                from handsonvlm_tpu.ops.decode_attention import (
                    decode_attention_stacked,
                )

                out = decode_attention_stacked(
                    q, ck, cv, layer_idx, cache_index + t, key_mask=key_mask
                )
        else:
            # XLA dots fuse the layer slice (no copy), unlike pallas operands.
            # Also serves small t>1 windows (speculative decode verify).
            k_l = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False)
            if quant:
                # dequantize the layer slice (materialized bf16 copy — only
                # spec verify windows and odd cache sizes take this path)
                ks_l = jax.lax.dynamic_index_in_dim(cks, layer_idx, 0, keepdims=False)
                vs_l = jax.lax.dynamic_index_in_dim(cvs, layer_idx, 0, keepdims=False)
                k_l = (k_l.astype(jnp.float32)
                       * jnp.transpose(ks_l, (0, 2, 1))[..., None]).astype(q.dtype)
                v_l = (v_l.astype(jnp.float32)
                       * jnp.transpose(vs_l, (0, 2, 1))[..., None]).astype(q.dtype)
            out = attention(
                q, k_l, v_l,
                key_mask=key_mask, causal=True, q_offset=q_offset,
                impl="xla", decode_length=cache_index + t,
            )
        out = out.reshape(b, t, h * hd)
    else:
        if layer_kv is not None:
            ck, cv = layer_kv  # (B, S_max, K, D)
            ck = jax.lax.dynamic_update_slice(ck, kx.astype(ck.dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vx.astype(cv.dtype), (0, cache_index, 0, 0))
            keys_, vals_ = ck, cv
            new_kv = (ck, cv)
        else:
            keys_, vals_ = kx, vx
            new_kv = (kx, vx)

        decode_length = None
        if layer_kv is not None and t == 1:
            decode_length = cache_index + t
        if (seq_mesh is not None and layer_kv is None
                and t % int(seq_mesh.shape.get("seq", 1)) == 0):
            # sequence-parallel training/prefill: exact ring attention over
            # the 'seq' mesh axis (parallel/ring_attention.py); composes
            # with the 'data' axis when present
            from handsonvlm_tpu.parallel.ring_attention import ring_attention

            out = ring_attention(
                q, keys_, vals_, mesh=seq_mesh, causal=True,
                key_mask=key_mask,
                batch_axis="data" if "data" in seq_mesh.shape else None,
            )
        else:
            out = attention(
                q, keys_, vals_, key_mask=key_mask, causal=True, q_offset=q_offset,
                impl=attn_impl, decode_length=decode_length,
            )
        out = out.reshape(b, t, h * hd)
    if int8_stacked is not None:
        hidden = hidden + proj8(out, "wo")
        x = rms_norm(hidden, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
        gate = jax.nn.silu(proj8(x, "w_gate"))
        up = proj8(x, "w_up")
        hidden = hidden + proj8(gate * up, "w_down")
        return hidden, new_kv
    if int4_stacked is not None:
        hidden = hidden + iproj(out, "wo") + lora_delta(lora_layer, "wo", out, lora_scale)
        x = rms_norm(hidden, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
        gu = iproj(x, "wgu")
        f = cfg.intermediate_size
        dgu = lora_delta_multi(lora_layer, ("w_gate", "w_up"), x, lora_scale)
        if isinstance(dgu, tuple):
            gate_in, up = gu[..., :f] + dgu[0], gu[..., f:] + dgu[1]
        else:
            gu = gu + dgu
            gate_in, up = gu[..., :f], gu[..., f:]
        gu = jax.nn.silu(gate_in) * up
        hidden = hidden + iproj(gu, "w_down") + lora_delta(lora_layer, "w_down", gu, lora_scale)
        return hidden, new_kv

    hidden = hidden + proj(out, "wo")

    x = rms_norm(hidden, lp["mlp_norm"]["scale"], cfg.rms_norm_eps)
    dgu = lora_delta_multi(lora_layer, ("w_gate", "w_up"), x, lora_scale)
    if not isinstance(dgu, tuple):
        f = cfg.intermediate_size
        dgu = ((0.0, 0.0) if isinstance(dgu, float)
               else (dgu[..., :f], dgu[..., f:]))
    gate = jax.nn.silu(maybe_int8_matmul(x, lp["mlp"]["w_gate"]) + dgu[0])
    up = maybe_int8_matmul(x, lp["mlp"]["w_up"]) + dgu[1]
    hidden = hidden + proj(gate * up, "w_down", "mlp")
    return hidden, new_kv


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def apply_llama(
    params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    kv_cache: Optional[KVCache] = None,
    attn_impl: str = "auto",
    remat=False,  # False | True/'full' | 'dots' | 'dots_nobatch' (_remat)
    lora: Optional[dict] = None,
    cache_scan_mode: str = "auto",
    tp_mesh=None,
    seq_mesh=None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack.

    - Training/prefill: pass embeddings of length T; `attn_mask` (B,T) marks
      valid (non-pad) positions.
    - Cached decode: pass `kv_cache`; new keys/values are written at
      `kv_cache.index`; attention spans the whole cache with positions
      `>= index + t` masked out. `attn_mask` then covers S_max keys
      (or None for "all written keys valid").

    Returns final hidden states (B,T,D) and the updated cache (or None).
    """
    if inputs_embeds is None:
        inputs_embeds = params["embed"]["weight"][input_ids]
    b, t, d = inputs_embeds.shape

    if kv_cache is not None:
        cache_index = kv_cache.index
        q_offset = cache_index
        s = kv_cache.max_len
        written = jnp.arange(s) < (cache_index + t)
        key_mask = written[None, :]
        if attn_mask is not None:
            key_mask = key_mask & attn_mask.astype(bool)
        key_mask = jnp.broadcast_to(key_mask, (b, s))
    else:
        cache_index = None
        q_offset = 0
        key_mask = attn_mask.astype(bool) if attn_mask is not None else None

    if positions is None:
        base = jnp.arange(t)[None, :]
        positions = base + (cache_index if kv_cache is not None else 0)
        positions = jnp.broadcast_to(positions, (b, t))
    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta)

    layer_params = params["layers"]
    # int4 projections stay OUT of the scan xs: the full stacked buffers are
    # scan constants read by scalar-prefetch layer indexing (scan-slicing
    # them would copy every layer's weights before each pallas call)
    int4_stacked = layer_params.get("int4")
    if int4_stacked is not None:
        layer_params = {k: v for k, v in layer_params.items() if k != "int4"}
    # same treatment for the fused-QLoRA stacked int8 tree (ops/qlora_fused)
    int8_stacked = layer_params.get("int8")
    if int8_stacked is not None:
        layer_params = {k: v for k, v in layer_params.items() if k != "int8"}
    lora_adapters = lora["adapters"] if lora is not None else None
    lora_scale = lora["scale"] if lora is not None else 0.0
    layer_ids = jnp.arange(cfg.num_layers)

    if isinstance(kv_cache, QuantKVCache):
        # int8 cache: decode/verify only (prefill quantizes a bf16 cache via
        # quantize_kv_cache inside the prefill program)
        if t > 8:
            raise ValueError("QuantKVCache serves decode windows (t<=8); "
                             "prefill on bf16 then quantize_kv_cache")

        def scan_body(carry, layer_in):
            hidden, ck, cv, cks, cvs = carry
            lp, lora_l, layer_idx = layer_in
            hidden, (ck, cv, cks, cvs) = _layer(
                hidden, lp, cfg, cos, sin, key_mask, q_offset, None,
                cache_index, attn_impl, lora_l, lora_scale,
                int4_stacked, layer_idx,
                stacked_kv=(ck, cv, cks, cvs), tp_mesh=tp_mesh,
                int8_stacked=int8_stacked,
            )
            return (hidden, ck, cv, cks, cvs), None

        if remat:
            scan_body = _remat(scan_body, remat)
        (hidden, ck, cv, cks, cvs), _ = jax.lax.scan(
            scan_body,
            (inputs_embeds, kv_cache.k, kv_cache.v, kv_cache.ks, kv_cache.vs),
            (layer_params, lora_adapters, layer_ids),
        )
        hidden = rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
        return hidden, QuantKVCache(
            k=ck, v=cv, ks=cks, vs=cvs, index=kv_cache.index + t
        )

    if kv_cache is not None:
        if cache_scan_mode == "auto":
            # small t>1 windows (speculative verify) also avoid the per-layer
            # slice copies; large-t prefill stays on carry (its slice cost is
            # amortized once and XLA handles the big DUS well there)
            cache_scan_mode = "stacked" if t <= 8 else "carry"
        if cache_scan_mode == "stacked":
            # Decode fast path: cache rides the carry WHOLE; each layer
            # writes t row(s) (in-place DUS) and attends through a
            # scalar-prefetched layer index (t==1 pallas kernel) or a fused
            # XLA slice — no per-layer (B,S,K,D) slice copies
            # (25-32 -> ~12 ms/step at 7B int4 B=8 S=832).

            def scan_body(carry, layer_in):
                hidden, ck, cv = carry
                lp, lora_l, layer_idx = layer_in
                hidden, (ck, cv) = _layer(
                    hidden, lp, cfg, cos, sin, key_mask, q_offset, None,
                    cache_index, attn_impl, lora_l, lora_scale,
                    int4_stacked, layer_idx, stacked_kv=(ck, cv),
                    tp_mesh=tp_mesh, int8_stacked=int8_stacked,
                )
                return (hidden, ck, cv), None

            if remat:
                scan_body = _remat(scan_body, remat)
            (hidden, ck, cv), _ = jax.lax.scan(
                scan_body, (inputs_embeds, kv_cache.k, kv_cache.v),
                (layer_params, lora_adapters, layer_ids),
            )
            hidden = rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
            return hidden, KVCache(k=ck, v=cv, index=kv_cache.index + t)

        if cache_scan_mode == "ys":
            # Cache layers ride the scan's native xs/ys slicing: each
            # iteration reads its (B,S,K,D) slice from xs and emits the
            # updated slice as ys — no dynamic gather/scatter of the full
            # (L,...) buffer inside the loop body. (The carry variant below
            # can make XLA materialise full-cache copies per layer; see
            # docs/PERF_NOTES.md decode-floor experiment.)
            def scan_body(hidden, layer_in):
                lp, lora_l, layer_idx, k_l, v_l = layer_in
                hidden, (nk, nv) = _layer(
                    hidden, lp, cfg, cos, sin, key_mask, q_offset, (k_l, v_l),
                    cache_index, attn_impl, lora_l, lora_scale,
                    int4_stacked, layer_idx, tp_mesh=tp_mesh,
                    int8_stacked=int8_stacked,
                )
                return hidden, (nk, nv)

            if remat:
                scan_body = _remat(scan_body, remat)
            hidden, (ck, cv) = jax.lax.scan(
                scan_body, inputs_embeds,
                (layer_params, lora_adapters, layer_ids, kv_cache.k, kv_cache.v),
            )
            hidden = rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
            return hidden, KVCache(k=ck, v=cv, index=kv_cache.index + t)

        # Cache lives in the scan *carry* and is updated in place with
        # dynamic_update_slice — XLA aliases the carry across iterations, so
        # decode touches one cache buffer instead of materialising a second
        # stacked copy as scan ys would.
        def scan_body(carry, layer_in):
            hidden, ck, cv = carry
            lp, lora_l, layer_idx = layer_in
            k_l = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False)
            hidden, (nk, nv) = _layer(
                hidden, lp, cfg, cos, sin, key_mask, q_offset, (k_l, v_l),
                cache_index, attn_impl, lora_l, lora_scale,
                int4_stacked, layer_idx, tp_mesh=tp_mesh,
                int8_stacked=int8_stacked,
            )
            ck = jax.lax.dynamic_update_index_in_dim(ck, nk, layer_idx, 0)
            cv = jax.lax.dynamic_update_index_in_dim(cv, nv, layer_idx, 0)
            return (hidden, ck, cv), None

        if remat:
            scan_body = _remat(scan_body, remat)
        (hidden, ck, cv), _ = jax.lax.scan(
            scan_body, (inputs_embeds, kv_cache.k, kv_cache.v),
            (layer_params, lora_adapters, layer_ids),
        )
        hidden = rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
        return hidden, KVCache(k=ck, v=cv, index=kv_cache.index + t)

    def scan_body(hidden, layer_in):
        lp, lora_l, layer_idx = layer_in
        hidden, _ = _layer(
            hidden, lp, cfg, cos, sin, key_mask, q_offset, None,
            cache_index, attn_impl, lora_l, lora_scale,
            int4_stacked, layer_idx, tp_mesh=tp_mesh, seq_mesh=seq_mesh,
            int8_stacked=int8_stacked,
        )
        return hidden, None

    if remat:
        scan_body = _remat(scan_body, remat)
    hidden, _ = jax.lax.scan(
        scan_body, inputs_embeds, (layer_params, lora_adapters, layer_ids)
    )
    hidden = rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
    return hidden, None


def lm_logits(params, cfg: LlamaConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project to vocab with fp32 accumulation (no fp32 weight copy: the MXU
    takes bf16 operands and accumulates fp32 via preferred_element_type).

    With a padded vocab (cfg.pad_vocab_multiple) the pad columns are masked
    to -inf so sampling/argmax/softmax never see them — the padded table is
    purely a sharding-layout choice, numerically invisible."""
    if cfg.tie_word_embeddings:
        w = params["embed"]["weight"].T
        scale = None
    elif "w8" in params["lm_head"]:
        # int8 weight-only head (quantize_lm_head): XLA streams the int8
        # table and fuses the upcast into the dot (w8bf16 path, measured
        # full-rate in tools/perf_int8_paths.py) — halves the 0.26 GB/step
        # bf16 head read in quantized decode modes.
        w = params["lm_head"]["w8"].astype(hidden.dtype)
        scale = params["lm_head"]["scale"]
    else:
        w = params["lm_head"]["weight"]
        scale = None
    logits = jax.lax.dot_general(
        hidden, w, (((hidden.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale is not None:
        logits = logits * scale
    if logits.shape[-1] != cfg.vocab_size:
        pad_mask = jnp.arange(logits.shape[-1]) >= cfg.vocab_size
        logits = jnp.where(pad_mask, -jnp.inf, logits)
    return logits
