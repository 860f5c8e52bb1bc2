"""Training throughput on the real chip: 7B QLoRA SFT step time / tokens/s / MFU.

Round-1 gap (VERDICT #5): the reference's PRIMARY workload is 8xH100 SFT
(scripts/finetune.sh) and the repo's train step was jitted, sharded,
remat'd — and unbenchmarked. This measures the jitted QLoRA step (int4
frozen base + LoRA r=R trainable, the single-chip training mode) on
EK-shaped batches: B samples x (prompt + 356 visual tokens) with 10 unique
CLIP frames per sample (training does not dedup; pass EK's tiled 100 via
PERF_FRAMES=100 to include the full reference-shaped vision cost).

MFU accounting: decoder fwd 2*P*T + bwd-dx 2*P*T (frozen base => no dw
pass through the big matmuls; LoRA dw is negligible) + CLIP fwd
2*P_clip*T_patches*... reported both as the standard 6PT convention and
the frozen-base 4PT one, against the v5e bf16 peak (197 TFLOP/s).

Env: PERF_PRESET=7b PERF_B=1,2,4 PERF_T=413 PERF_LORA_R=128 PERF_STEPS=6
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not jax.config.jax_compilation_cache_dir:  # don't clobber a caller's dir
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/handsonvlm_jax")

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import get_config
from handsonvlm_tpu.infer.builder import load_pretrained_model
from handsonvlm_tpu.models.lora import init_lora
from handsonvlm_tpu.train.step import make_train_step
from handsonvlm_tpu.train.train_state import create_train_state, make_optimizer

PEAK_TFLOPS = 197.0  # v5e bf16


def make_batch(cfg, b, t, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 30000, size=(b, t))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    ids[:, [t - 9, t - 7, t - 5, t - 3]] = HAND_TOKEN_ID
    labels = np.full((b, t), IGNORE_INDEX)
    labels[:, t - 12 :] = ids[:, t - 12 :]
    return {
        "input_ids": jnp.asarray(ids),
        "attn_mask": jnp.ones((b, t), bool),
        "image": jnp.asarray(
            rng.normal(size=(
                b, n_frames, 3, cfg.vision.image_size, cfg.vision.image_size
            )), cfg.cdtype
        ),
        "labels": jnp.asarray(labels),
        "future_hands": jnp.asarray(rng.uniform(size=(b, 2, 5, 2)), jnp.float32),
        "future_valid": jnp.ones((b, 2), jnp.float32),
    }


def flops_per_step(cfg, b, t_spliced, n_frames):
    l = cfg.llama
    p_dec = (
        l.num_layers
        * (4 * l.hidden_size * l.num_heads * l.head_dim_ + 3 * l.hidden_size * l.intermediate_size)
        + 2 * l.padded_vocab_size * l.hidden_size
    )
    v = cfg.vision
    p_clip = v.num_layers * (4 * v.hidden_size**2 + 2 * v.hidden_size * v.intermediate_size)
    tok_dec = b * t_spliced
    tok_clip = b * n_frames * (v.num_patches + 1)
    clip_f = 2 * p_clip * tok_clip  # frozen: forward only
    return {
        "6pt": 6 * p_dec * tok_dec + clip_f,
        "4pt": 4 * p_dec * tok_dec + clip_f,  # frozen base: no dw pass
        "tokens": tok_dec,
    }


def main():
    preset = os.environ.get("PERF_PRESET", "7b")
    t = int(os.environ.get("PERF_T", "413"))
    r = int(os.environ.get("PERF_LORA_R", "128"))
    steps = int(os.environ.get("PERF_STEPS", "6"))
    n_frames = int(os.environ.get("PERF_FRAMES", "10"))
    bs = [int(x) for x in os.environ.get("PERF_B", "1,2,4").split(",")]
    mu_bf16 = os.environ.get("PERF_MU_BF16", "0") == "1"
    # PERF_MODE=full: FULL SFT (no quantized base, no LoRA — every decoder
    # weight trains). 7B full SFT cannot fit one 16 GB chip; use
    # PERF_PRESET=1b (params+grads+Adam ~14 GB with PERF_MU_BF16=1).
    full_sft = os.environ.get("PERF_MODE", "qlora") == "full"
    # PERF_QUANT=int8: int8 frozen base instead of int4 — 2x weight DMA
    # but no nibble-unpack vector work in the prefill GEMMs (the dequant
    # tax named by the round-3 MFU decomposition). PERF_LORA_R=0 drops the
    # adapter entirely (projector/CVAE still train), isolating the
    # sub-MXU LoRA-dot tax. Accepts a comma list for an IN-PROCESS sweep
    # when the variants share device buffers: "int8,int8_fused" loads ONE
    # int8 tree and derives the fused layout by pure pytree restructure
    # (ops/qlora_fused.stack_llama_int8 — zero extra HBM), so the A/B is
    # immune to the 1.5-2x cross-process tunnel variance (CLAUDE.md).
    quants = [q for q in os.environ.get("PERF_QUANT", "int4").split(",") if q]
    if len(quants) > 1 and set(quants) != {"int8", "int8_fused"}:
        raise SystemExit("PERF_QUANT list sweep supports only int8,int8_fused "
                         "(shared buffers); other variants need their own tree")
    quants.sort()  # int8 before int8_fused: fused derives from the flat tree
    load_q = "int8" if quants == ["int8", "int8_fused"] else quants[0]

    params, cfg, _tok = load_pretrained_model(
        f"random:{preset}", preset, quantize=None if full_sft else load_q
    )
    if not full_sft and r > 0:
        params["lora"] = init_lora(jax.random.PRNGKey(42), cfg.llama, r=r, alpha=2 * r)
    import dataclasses

    cfg = dataclasses.replace(cfg, num_frames=n_frames)
    # HANDSONVLM_REMAT accepts a comma list for an in-process policy sweep
    # (tunnel throughput varies 1.5-2x across processes — CLAUDE.md; the
    # weight tree and optimizer state are shared across policies).
    # PERF_LORA_GROUPED="1,first,0" additionally sweeps the adapter-dot
    # layout (models/lora.lora_delta_multi; the flag is read at trace
    # time, so it is pinned per step-fn at first call).
    remats = [x for x in os.environ.get("HANDSONVLM_REMAT", "full").split(",") if x]
    groupeds = [x for x in os.environ.get("PERF_LORA_GROUPED", "").split(",") if x]
    t_spliced = t + cfg.num_visual_tokens - 1
    for quant in quants:
        if quant == "int8_fused" and load_q == "int8":
            from handsonvlm_tpu.ops.qlora_fused import stack_llama_int8

            # params now points at the POST-step donated chain's tree: its
            # leaves are live device buffers shared with the new layout
            params = dict(params)
            params["llama"] = stack_llama_int8(params["llama"])
        tx = make_optimizer(
            learning_rate=2e-5, params_template=params,
            freeze_top_keys=("vision",) if full_sft else ("vision", "llama"),
            mu_dtype=jnp.bfloat16 if mu_bf16 else None,
        )
        if quant != quants[0] and not mu_bf16:
            # the llama restructure (flat -> stacked) changes the opt_state
            # pytree, so the first variant's Adam moments cannot be grafted
            # onto the second — and this tunnel never returns freed device
            # buffers (CLAUDE.md), so the dropped moments (~2.6 GB at r=128
            # fp32) are simply LOST for the rest of the process. Warn: the
            # two-variant sweep should run with PERF_MU_BF16=1 (halves the
            # lost+new moment memory) or a smaller PERF_R at 7B.
            print("WARNING: second quant variant re-inits Adam moments; the "
                  "first variant's are leaked on this backend (freed device "
                  "memory is never reusable). Use PERF_MU_BF16=1 or smaller "
                  "PERF_R to keep the two-variant sweep inside HBM at 7B.",
                  flush=True)
        state = create_train_state(params, tx)
        steps_by_remat = {}
        for rm in remats:
            if groupeds:
                for g in groupeds:
                    steps_by_remat[f"{rm}/grouped={g}"] = (
                        make_train_step(cfg, tx, remat=rm), g)
            else:
                steps_by_remat[rm] = (make_train_step(cfg, tx, remat=rm), None)

        state = run_sweep(cfg, bs, t, n_frames, steps_by_remat, state, steps,
                          r, full_sft, quant, t_spliced)
        # the steps donate the state: the pre-sweep tree's buffers are gone;
        # the next variant must restructure the POST-sweep live tree
        params = state.params


def run_sweep(cfg, bs, t, n_frames, steps_by_remat, state, steps, r,
              full_sft, quant, t_spliced):
    for b in bs:
        batches = [make_batch(cfg, b, t, n_frames, seed=s) for s in range(2)]
        for rm, (step, grouped) in steps_by_remat.items():
            # the step donates the state, so ONE evolving chain threads
            # through every policy/batch (a dead chain's buffers would be
            # lost to the allocator — CLAUDE.md freed-memory bug)
            if grouped is not None:  # pinned into this step fn at trace time
                os.environ["HANDSONVLM_LORA_GROUPED"] = grouped
            try:
                state, m = step(state, batches[0], jax.random.PRNGKey(0))  # compile
                float(m["loss"])
            except Exception as e:
                # compile failures (VMEM/HBM OOM) leave the donated state
                # intact — execution never started; keep sweeping
                print(f"B={b} remat={rm} FAILED: {type(e).__name__}: "
                      f"{str(e)[:220]}", flush=True)
                continue
            t0 = time.time()
            for i in range(steps):
                state, m = step(state, batches[i % 2], jax.random.PRNGKey(i))
            loss = float(m["loss"])  # syncs the chain
            dt = (time.time() - t0) / steps
            fl = flops_per_step(cfg, b, t_spliced, n_frames)
            mode = "full-sft" if full_sft else f"lora_r={r} base={quant}"
            line = (
                f"B={b} T_spliced={t_spliced} frames={n_frames} {mode} remat={rm}: "
                f"{dt*1e3:.0f} ms/step  {fl['tokens']/dt:.0f} tok/s  "
                f"MFU(6PT)={fl['6pt']/dt/1e12/PEAK_TFLOPS*100:.1f}%  "
            )
            if not full_sft:
                line += f"MFU(4PT-frozen)={fl['4pt']/dt/1e12/PEAK_TFLOPS*100:.1f}%  "
            print(line + f"loss={loss:.3f}", flush=True)
    return state


if __name__ == "__main__":
    main()
