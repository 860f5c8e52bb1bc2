"""SFT training entry point.

Replaces `handsonvlm/train/train.py` + `handsonvlm_trainer.py` + the
DeepSpeed launcher: single-controller JAX over a ('data','model') mesh,
FSDP-sharded params/optimizer (ZeRO-3 equivalent), Orbax auto-resume,
host-callback metrics.

Usage (recipe defaults mirror scripts/finetune.sh):
  python -m handsonvlm_tpu.train.train \
      --model-path /ckpts/vicuna-7b-init --preset 7b \
      --output-dir ./runs/handsonvlm-7b --epochs 40 --batch-size 128
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default="random:tiny",
                   help="HF init checkpoint dir, orbax dir, or random:<preset>")
    p.add_argument("--preset", default="7b")
    p.add_argument("--num-frames", type=int, default=0,
                   help="override the preset's video frame slots "
                        "(reference ModelArguments.num_frames; 0 = preset)")
    p.add_argument("--max-len", type=int, default=0,
                   help="context length budget (0 = preset, 2048 like the "
                        "reference's model_max_length). >2048 lifts the "
                        "reference's cap: RoPE here is computed from "
                        "positions directly (no table), pair with "
                        "--seq-parallel to shard attention over the seq "
                        "axis (e.g. --max-len 4096 --seq-parallel 4)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--ek-version", default="ek100")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--samples-per-epoch", type=int, default=48296)
    p.add_argument("--batch-size", type=int, default=128, help="global batch")
    p.add_argument("--learning-rate", type=float, default=2e-5)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--model-axis", type=int, default=1, help="TP axis size")
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="sequence-parallel axis size (ring attention over a "
                        "('data','seq') mesh; pad/bucket lengths to a "
                        "multiple or attention falls back to unsharded)")
    p.add_argument("--lora-r", type=int, default=0,
                   help="enable LoRA with this rank (reference: 128)")
    p.add_argument("--lora-alpha", type=float, default=256.0)
    p.add_argument("--lora-bf16", action="store_true",
                   help="run the adapter matmuls in bf16 (f32 master "
                        "weights/optimizer unchanged): at r=128 the f32 "
                        "adapter dots are ~6%% of base FLOPs at a fraction "
                        "of bf16 MXU rate — MFU probe knob")
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "dots", "dots_nobatch", "save_lora"],
                   help="gradient-checkpoint save policy over the decoder "
                        "scan: full = recompute everything (min memory, "
                        "reference recipe); dots = keep matmul outputs "
                        "(fewer recomputed MXU flops, more HBM); save_lora "
                        "= full + keep the tiny LoRA first-stage outputs")
    p.add_argument("--mu-bf16", action="store_true",
                   help="bf16 Adam first moment (halves moment memory; "
                        "enables 13B QLoRA r=128 on one 16 GB chip)")
    p.add_argument("--qlora", choices=["int8", "int8_fused", "int4"],
                   default=None,
                   help="quantize the frozen decoder base (requires --lora-r): "
                        "int8 is the 7B recommendation (53-54% MFU), int4 "
                        "fits 13B on one 16 GB chip (gradients flow through "
                        "the quantized projections via ops/int8_matmul "
                        "custom VJPs); int8_fused is EXPERIMENTAL AND "
                        "MEASURED SLOWER than int8 (290 vs 272 ms/step at "
                        "7B r=128 — the pallas base GEMM trails XLA's int8 "
                        "dot and the epilogue fusion recovers only ~2 ms of "
                        "the adapter tax; docs/PERF_NOTES.md round 5)")
    p.add_argument("--tune-mm-mlp-adapter", action="store_true",
                   help="train only the mm_projector and save adapter-only "
                        "checkpoints (reference train.py:104-122 "
                        "mm_projector.bin; the LLaVA pretraining recipe)")
    p.add_argument("--rephrase-rate", type=float, default=0.3)
    p.add_argument("--use-percentage", type=float, default=1.0)
    p.add_argument("--save-every", type=int, default=0, help="steps; 0 = per epoch")
    p.add_argument("--eval-every", type=int, default=0,
                   help="steps between generate+ADE/FDE evals (0 = off); "
                        "replaces HandsOnVLMTrainer.evaluation_loop")
    p.add_argument("--eval-samples", type=int, default=64,
                   help="EK validation clips per in-training eval")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--max-steps", type=int, default=0, help="0 = epochs*spe/bs")
    p.add_argument("--tasks", default="epic_kitchen",
                   help="|| separated: epic_kitchen, reasoning, pretrain, "
                        "dvc, event_loc, imgqa, vidqa, temporal_reasoning "
                        "(the reference's task mixture, arguments.py "
                        "DataArguments.tasks + llava pretrain stage)")
    p.add_argument("--data-path", default=None,
                   help="root of the LITA/LLaVA task data (defaults to "
                        "$HANDSONVLM_DATA_ROOT)")
    p.add_argument("--task-sample-rates", default=None,
                   help="comma list, one rate per dataset group in --tasks order; "
                        "epic variants (epic_kitchen/reasoning/vanilla) share "
                        "ONE group at the first epic position (default uniform)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic samples (smoke runs without EK data)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from handsonvlm_tpu.core.checkpoint import (
        restore_train_state,
        save_artifact,
        save_train_state,
    )
    from handsonvlm_tpu.data.epic_dataset import (
        EpicConversationDataset,
        EpicMultiturnConversationDataset,
        EpicReasoningConversationDataset,
    )
    from handsonvlm_tpu.data.epic_structures import get_epic_hoi_dataset_by_name
    from handsonvlm_tpu.data.hybrid_dataset import Collator, HybridDataset
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.parallel.mesh import create_mesh
    from handsonvlm_tpu.parallel.partition import shard_params
    from handsonvlm_tpu.train.loader import PrefetchLoader
    from handsonvlm_tpu.train.step import make_train_step
    from handsonvlm_tpu.train.train_state import (
        cosine_schedule,
        create_train_state,
        make_optimizer,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    mesh = create_mesh(model=args.model_axis, seq=args.seq_parallel)
    seq_mesh = mesh if args.seq_parallel > 1 else None
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    if args.qlora and not args.lora_r:
        raise SystemExit("--qlora requires --lora-r (the base is frozen)")
    params, cfg, tokenizer = load_pretrained_model(
        args.model_path, args.preset, quantize=args.qlora
    )
    if args.num_frames or args.max_len:
        import dataclasses as _dc

        if args.num_frames:
            cfg = _dc.replace(cfg, num_frames=args.num_frames)
        if args.max_len:
            cfg = _dc.replace(
                cfg, max_length=args.max_len,
                llama=_dc.replace(
                    cfg.llama,
                    max_position_embeddings=max(
                        args.max_len, cfg.llama.max_position_embeddings),
                ),
            )
            tokenizer.model_max_length = args.max_len
    freeze = ("vision",)
    if args.lora_r:
        from handsonvlm_tpu.models import lora as lora_mod
        from handsonvlm_tpu.models.lora import init_lora

        if args.lora_bf16:
            lora_mod.LORA_COMPUTE_BF16 = True
        params["lora"] = init_lora(
            jax.random.PRNGKey(42), cfg.llama, r=args.lora_r, alpha=args.lora_alpha
        )
        freeze = ("vision", "llama")  # adapters + projector + traj head train
    if args.tune_mm_mlp_adapter:
        if args.lora_r:
            raise SystemExit("--tune-mm-mlp-adapter is exclusive with --lora-r")
        freeze = tuple(k for k in params if k != "projector")
    params = shard_params(params, mesh)

    def save_adapters(params, out_dir):
        """Adapter-only artifacts next to the full checkpoints: the load-side
        counterpart is infer/builder.py's adapter path."""
        if args.tune_mm_mlp_adapter:
            save_artifact(out_dir, "mm_projector", params["projector"],
                          meta={"base": args.model_path, "preset": args.preset})
        if args.lora_r:
            save_artifact(out_dir, "lora", params["lora"],
                          meta={"base": args.model_path, "preset": args.preset,
                                "r": args.lora_r, "alpha": args.lora_alpha,
                                "qlora": args.qlora})
            save_artifact(out_dir, "non_lora_trainables",
                          {"projector": params["projector"], "traj": params["traj"]})

    steps_per_epoch = max(args.samples_per_epoch // args.batch_size, 1)
    total_steps = args.max_steps or args.epochs * steps_per_epoch
    sched = cosine_schedule(args.learning_rate, total_steps, args.warmup_ratio)
    tx = make_optimizer(
        sched, weight_decay=args.weight_decay, params_template=params,
        freeze_top_keys=freeze,
        mu_dtype=jnp.bfloat16 if args.mu_bf16 else None,
    )
    state = create_train_state(params, tx)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    restored = restore_train_state(ckpt_dir, state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")

    # data
    if args.synthetic:
        from handsonvlm_tpu.data.synthetic import SyntheticConversationDataset

        hybrid = HybridDataset(
            task_datasets=[[SyntheticConversationDataset(tokenizer, cfg, n=args.synthetic)]],
            task_sample_rate=[1.0],
            samples_per_epoch=args.samples_per_epoch,
        )
    else:
        from handsonvlm_tpu.data.epic_constants import data_root
        from handsonvlm_tpu.data.lita_datasets import (
            LITA_DATASET_REGISTRY,
            LlavaPretrainDataset,
        )

        data_path = args.data_path or data_root()
        tasks = args.tasks.split("||")
        epic_names = {"epic_kitchen", "reasoning", "vanilla"}
        # epic variants form ONE task group (reference semantics: DataArguments
        # treats epic_kitchen as a single task whose datasets mix within the
        # group), placed at the position of the FIRST epic entry in --tasks so
        # --task-sample-rates lines up with the group order the user wrote
        group_names = []  # one entry per dataset group, in --tasks order
        task_datasets = []
        want_epic = any(t in epic_names for t in tasks) or all(
            t not in LITA_DATASET_REGISTRY and t != "pretrain" for t in tasks
        )
        epic_done = False

        def build_epic_group():
            hoi = get_epic_hoi_dataset_by_name(
                args.ek_version, "train", load_images=True,
                rephrase_rate=args.rephrase_rate, use_percentage=args.use_percentage,
            )
            group = []
            if "epic_kitchen" in tasks:
                group.append(EpicMultiturnConversationDataset(tokenizer, hoi))
            if "reasoning" in tasks:
                group.append(EpicReasoningConversationDataset(tokenizer, hoi))
            if not group:
                group.append(EpicConversationDataset(tokenizer, hoi))
            return group

        for t in tasks:
            if t in epic_names:
                if want_epic and not epic_done:
                    task_datasets.append(build_epic_group())
                    group_names.append("epic")
                    epic_done = True
            elif t == "pretrain":
                # projector-pretraining stage (llava/train/train.py
                # LazySupervisedDataset + plain template); pair with
                # --tune-mm-mlp-adapter for the reference recipe
                task_datasets.append([LlavaPretrainDataset(data_path, tokenizer)])
                group_names.append(t)
            elif t in LITA_DATASET_REGISTRY:
                task_datasets.append([
                    cls(data_path, tokenizer)
                    for cls in LITA_DATASET_REGISTRY[t].values()
                ])
                group_names.append(t)
        if want_epic and not epic_done:  # no task recognized: default EK SFT
            task_datasets.append(build_epic_group())
            group_names.append("epic")
        if args.task_sample_rates:
            rates = [float(x) for x in args.task_sample_rates.split(",")]
            if len(rates) != len(task_datasets):
                raise SystemExit(
                    f"--task-sample-rates has {len(rates)} entries but --tasks "
                    f"resolves to {len(task_datasets)} dataset groups "
                    f"{group_names} (epic variants share one group)")
        else:
            rates = [1.0] * len(task_datasets)
        hybrid = HybridDataset(
            task_datasets=task_datasets, task_sample_rate=rates,
            samples_per_epoch=args.samples_per_epoch,
        )
    collate = Collator(
        pad_token_id=tokenizer.pad_token_id,
        model_max_length=cfg.max_length,
        num_frames=cfg.num_frames,
        seq_multiple=args.seq_parallel,
        splice_extra=cfg.num_visual_tokens - 1,
    )
    batch_sharding = NamedSharding(mesh, P("data"))
    loader = PrefetchLoader(
        hybrid, collate, args.batch_size,
        num_steps=total_steps - int(state.step), sharding=batch_sharding,
    )

    # optional generate+score eval during training
    # (HandsOnVLMTrainer.evaluation_loop equivalent, handsonvlm_trainer.py:110-322)
    eval_dataset = None
    if args.eval_every:
        from handsonvlm_tpu.eval.evaluator import (
            InferenceEngine,
            evaluate_epic_kitchen_traj,
        )

        eval_hoi = get_epic_hoi_dataset_by_name(
            args.ek_version, "validation", load_images=True,
            rephrase_rate=0.0, use_percentage=1.0,
        )
        eval_dataset = EpicConversationDataset(tokenizer, eval_hoi, deterministic=True)

    def run_eval(params, step):
        engine = InferenceEngine(params=params, cfg=cfg, tokenizer=tokenizer)
        res = evaluate_epic_kitchen_traj(
            engine, eval_dataset, seed=step, log_every=0, limit=args.eval_samples
        )
        return {f"eval/{k}": res[k] for k in ("ade", "fde", "wde", "n")}

    step_fn = make_train_step(cfg, tx, seq_mesh=seq_mesh, remat=args.remat_policy)
    rng = jax.random.PRNGKey(0)
    save_every = args.save_every or steps_per_epoch
    from handsonvlm_tpu.utils.metrics_writer import MetricsWriter

    writer = MetricsWriter(args.output_dir)

    t0 = time.time()
    for batch in loader:
        state, metrics = step_fn(state, batch, rng)
        step = int(state.step)
        if eval_dataset is not None and step % args.eval_every == 0:
            em = run_eval(state.params, step)
            print(json.dumps(dict(em, step=step)))
            writer.log(em, step)
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(lr=float(sched(step)),
                     sec_per_step=(time.time() - t0) / max(args.log_every, 1))
            t0 = time.time()
            print(json.dumps(dict(m, step=step)))
            writer.log(m, step)
        if step % save_every == 0 or step >= total_steps:
            save_train_state(ckpt_dir, state, step)
            save_adapters(state.params, args.output_dir)
            print(f"saved checkpoint at step {step}")
        if step >= total_steps:
            break
    save_train_state(ckpt_dir, state, int(state.step))
    save_adapters(state.params, args.output_dir)
    writer.close()
    print("training complete")


if __name__ == "__main__":
    main()
