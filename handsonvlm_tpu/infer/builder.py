"""Model loading: checkpoint -> (params, config, tokenizer).

Replaces `handsonvlm/model/builder.py:18-159`. Supports:
- an HF HandsOnVLM checkpoint directory (sharded safetensors/bin) via
  convert/hf_to_jax (traj decoder forced to CVAE like builder.py:91);
- an Orbax checkpoint produced by this framework's trainer;
- `random:<preset>` for smoke runs without weights.

Tokenizer: the HF Vicuna sentencepiece with the time/hand-token surgery
when present next to the checkpoint; otherwise the deterministic mock.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import HandsOnVLMConfig, get_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm


def load_tokenizer(model_path: Optional[str], model_max_length: int = 2048):
    if model_path and os.path.exists(os.path.join(model_path, "tokenizer.model")):
        from handsonvlm_tpu.data.tokenization import HFTokenizer

        return HFTokenizer(model_path, model_max_length)
    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer

    return MockTokenizer(model_max_length)


def _load_adapter_checkpoint(model_path, preset, dtype, _maybe_quantize):
    """Adapter-only checkpoint dirs produced by the trainer's
    --tune-mm-mlp-adapter / --lora-r paths. The counterpart of the
    reference builder's mm_projector.bin and LoRA
    base+non_lora_trainables+merge loads (handsonvlm/model/builder.py:37-87).

    The artifact's .json metadata names the base checkpoint; the adapter is
    grafted onto it (projector swap, or non-LoRA trainables restore +
    adapter merge into the decoder weights)."""
    import json

    from handsonvlm_tpu.core.checkpoint import has_artifact, restore_artifact

    kind = "lora" if has_artifact(model_path, "lora") else "mm_projector"
    meta_path = os.path.join(model_path, kind + ".json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{model_path} holds a '{kind}' adapter but no {kind}.json metadata "
            "naming its base checkpoint; re-save with the trainer or write "
            '{"base": <path>, "preset": <preset>} alongside it'
        )
    with open(meta_path) as f:
        meta = json.load(f)
    params, cfg, tokenizer = load_pretrained_model(
        meta["base"], meta.get("preset", preset), dtype
    )
    if kind == "mm_projector":
        params["projector"] = restore_artifact(model_path, "mm_projector")
    else:
        from handsonvlm_tpu.models.lora import merge_lora

        extra = restore_artifact(model_path, "non_lora_trainables")
        params.update(extra)
        params["llama"] = merge_lora(params["llama"], restore_artifact(model_path, "lora"))
    return _maybe_quantize(params), cfg, tokenizer


def load_pretrained_model(
    model_path: str,
    preset: str = "7b",
    dtype=jnp.bfloat16,
    quantize: Optional[str] = None,
) -> Tuple[dict, HandsOnVLMConfig, object]:
    """Returns (params, cfg, tokenizer). quantize='int8' converts the decoder
    projections to int8 weight-only (halves decoder memory; 13B fits one
    16GB chip)."""
    cfg = get_config(preset)
    # the released checkpoints always ship the CVAE head (builder.py:91)
    cfg = dataclasses.replace(
        cfg, traj=dataclasses.replace(cfg.traj, kind="CVAE")
    )
    tokenizer = load_tokenizer(None if model_path.startswith("random:") else model_path)

    def _maybe_quantize(params):
        if quantize in ("int8", "int8_fused"):
            from handsonvlm_tpu.ops.int8_matmul import quantize_llama

            params["llama"] = quantize_llama(params["llama"])
            if quantize == "int8_fused":
                # fused QLoRA path: projections become scan constants read
                # by the epilogue-fused pallas kernels (ops/qlora_fused)
                from handsonvlm_tpu.ops.qlora_fused import stack_llama_int8

                params["llama"] = stack_llama_int8(params["llama"])
        elif quantize == "int4":
            from handsonvlm_tpu.ops.int8_matmul import quantize_llama_int4

            params["llama"] = quantize_llama_int4(params["llama"])
        elif quantize:
            raise ValueError(f"unknown quantize mode {quantize}")
        return params

    if model_path.startswith("random:"):
        if quantize in ("int8", "int8_fused", "int4"):
            # direct quantized init: quantizing a materialized bf16 7B/13B
            # tree OOMs the 16 GB chip because freed Python-level device
            # buffers never return to the allocator pool (CLAUDE.md);
            # bench.py uses the same recipe
            from handsonvlm_tpu.models.clip_vit import init_clip_vision
            from handsonvlm_tpu.models.projector import init_projector
            from handsonvlm_tpu.models.traj_cvae import init_traj_decoder
            from handsonvlm_tpu.ops.int8_matmul import (
                init_llama_int4,
                init_llama_int8,
            )

            init_q = init_llama_int4 if quantize == "int4" else init_llama_int8
            if quantize == "int8_fused":
                from handsonvlm_tpu.ops.qlora_fused import stack_llama_int8

                def init_q(k, lcfg, dt):  # noqa: F811 — fused variant
                    return stack_llama_int8(init_llama_int8(k, lcfg, dt))
            k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
            d = cfg.llama.hidden_size
            params = {
                "llama": init_q(k1, cfg.llama, cfg.pdtype),
                "vision": jax.jit(
                    lambda k: init_clip_vision(k, cfg.vision, cfg.pdtype)
                )(k2),
                "projector": jax.jit(
                    lambda k: init_projector(k, cfg.mm_hidden_size, d, cfg.pdtype)
                )(k3),
                "traj": jax.jit(
                    lambda k: init_traj_decoder(k, cfg.traj, d // 2, cfg.pdtype)
                )(k4),
            }
            return params, cfg, tokenizer
        # jitted init: one program, no fp32 temporaries fragmenting the heap
        params = jax.jit(lambda k: init_handsonvlm(k, cfg))(jax.random.PRNGKey(0))
        return _maybe_quantize(params), cfg, tokenizer

    if quantize and jax.devices()[0].platform != "cpu":
        # Real checkpoints quantize HOST-SIDE: loading the bf16 tree onto
        # the chip and quantizing there peaks at bf16+quant (17+ GB at 7B)
        # and the freed bf16 buffers never return to this tunnel's
        # allocator (CLAUDE.md). Load + quantize on the CPU backend, then
        # ship only the quantized tree.
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params, cfg, tokenizer = load_pretrained_model(
                model_path, preset, dtype, quantize=None
            )
            params = _maybe_quantize(params)
        return jax.device_put(params), cfg, tokenizer

    if os.path.isdir(model_path) and (
        os.path.isdir(os.path.join(model_path, "mm_projector"))
        or os.path.isdir(os.path.join(model_path, "lora"))
    ):
        return _load_adapter_checkpoint(model_path, preset, dtype, _maybe_quantize)

    from handsonvlm_tpu.core.checkpoint import (
        is_params_export,
        is_trainer_output,
        restore_params,
    )

    if (
        os.path.isdir(os.path.join(model_path, "orbax"))
        or os.path.exists(os.path.join(model_path, "_CHECKPOINT_METADATA"))
        or is_params_export(model_path)
        or is_trainer_output(model_path)
    ):
        params = restore_params(model_path, cfg, dtype)
        return _maybe_quantize(params), cfg, load_tokenizer(model_path)

    from handsonvlm_tpu.convert.hf_to_jax import convert_handsonvlm, load_state_dict

    sd = load_state_dict(model_path)
    params = convert_handsonvlm(sd, cfg, dtype)
    if "vision" not in params:
        raise ValueError(
            f"checkpoint at {model_path} lacks the vision tower; provide a "
            "full HandsOnVLM checkpoint"
        )
    return _maybe_quantize(params), cfg, tokenizer
