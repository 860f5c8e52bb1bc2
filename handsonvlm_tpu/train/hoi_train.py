"""Standalone hoi-forecast training CLI (reference: hoi_forecast options +
epoch loops; SURVEY §3.5 secondary workload).

Usage:
  HANDSONVLM_DATA_ROOT=/data python -m handsonvlm_tpu.train.hoi_train \
      --output-dir runs/hoi --epochs 35 --batch-size 128 --lr 1e-4
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    # nets opts (netsopts.py)
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--coord-dim", type=int, default=64)
    p.add_argument("--num-heads", type=int, default=8)
    p.add_argument("--enc-depth", type=int, default=6)
    p.add_argument("--dec-depth", type=int, default=4)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--latent-dim", type=int, default=256)
    p.add_argument("--lambda-obj", type=float, default=0.1)
    p.add_argument("--lambda-traj", type=float, default=1.0)
    p.add_argument("--lambda-obj-kl", type=float, default=1e-3)
    p.add_argument("--lambda-traj-kl", type=float, default=1e-3)
    p.add_argument("--lambda-last-hand", type=float, default=1e-3)
    p.add_argument("--global-only", action="store_true")
    # train opts (expopts.py)
    p.add_argument("--optimizer", default="adam", choices=["adam", "adamw", "sgd", "rms"])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--epochs", type=int, default=35)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--ek-version", default="ek100")
    p.add_argument("--eval-every", type=int, default=5, help="epochs")
    p.add_argument("--num-samples", type=int, default=5)
    p.add_argument("--output-dir", required=True)
    args = p.parse_args()

    import jax
    import numpy as np
    import optax

    from handsonvlm_tpu.core.checkpoint import restore_train_state, save_train_state
    from handsonvlm_tpu.data.epic_structures import get_epic_hoi_dataset_by_name
    from handsonvlm_tpu.models.object_transformer import (
        ObjectTransformerConfig,
        init_object_transformer,
    )
    from handsonvlm_tpu.train.hoi_trainer import (
        epoch_evaluate,
        epoch_pass,
        make_hoi_optimizer,
        make_hoi_train_step,
        warmup_schedule,
    )
    from handsonvlm_tpu.train.train_state import create_train_state

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = ObjectTransformerConfig(
        token_dim=args.embed_dim, coord_dim=args.coord_dim,
        num_heads=args.num_heads, enc_depth=args.enc_depth,
        dec_depth=args.dec_depth, hidden_dim=args.hidden_dim,
        latent_dim=args.latent_dim,
        num_patches=1 if args.global_only else 5, global_only=args.global_only,
    )
    lambdas = dict(
        lambda_obj=args.lambda_obj, lambda_traj=args.lambda_traj,
        lambda_obj_kl=args.lambda_obj_kl, lambda_traj_kl=args.lambda_traj_kl,
        lambda_last_hand=args.lambda_last_hand,
    )

    train_ds = get_epic_hoi_dataset_by_name(args.ek_version, "train", load_images=False)
    val_ds = get_epic_hoi_dataset_by_name(args.ek_version, "validation", load_images=False)
    iters_per_epoch = max(len(train_ds) // args.batch_size, 1)

    params = init_object_transformer(jax.random.PRNGKey(0), cfg)
    sched = warmup_schedule(
        args.lr, args.warmup_epochs * iters_per_epoch,
        optax.cosine_decay_schedule(args.lr, args.epochs * iters_per_epoch),
    )
    tx = make_hoi_optimizer(params, args.optimizer, schedule=sched, weight_decay=args.weight_decay)
    state = create_train_state(params, tx)
    restored = restore_train_state(os.path.join(args.output_dir, "ckpt"), state)
    if restored is not None:
        state = restored

    step_fn = make_hoi_train_step(cfg, tx, lambdas)

    def batches(ds, n_steps, seed):
        rng = np.random.default_rng(seed)
        hoi_keys = ("feat", "bbox_feat", "valid_mask", "future_hands", "contact_point", "future_valid")
        for _ in range(n_steps):
            idxs = rng.integers(0, len(ds), size=args.batch_size)
            samples = [ds[int(i)][0] for i in idxs]
            yield {k: np.stack([np.asarray(s[k], np.float32) for s in samples]) for k in hoi_keys}

    for epoch in range(args.epochs):
        state, means = epoch_pass(
            batches(train_ds, iters_per_epoch, epoch), state, step_fn, jax.random.PRNGKey(epoch)
        )
        print(json.dumps({"epoch": epoch, **means}))
        if (epoch + 1) % args.eval_every == 0:
            metrics = epoch_evaluate(
                batches(val_ds, max(len(val_ds) // args.batch_size, 1), 10_000 + epoch),
                state.params, cfg, jax.random.PRNGKey(999 + epoch),
                num_samples=args.num_samples,
            )
            print(json.dumps({"epoch": epoch, **{f"val/{k}": v for k, v in metrics.items()}}))
        save_train_state(os.path.join(args.output_dir, "ckpt"), state, int(state.step))


if __name__ == "__main__":
    main()
