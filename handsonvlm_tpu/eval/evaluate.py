"""EK100 evaluation CLI (reference: handsonvlm/evaluation/evaluate.py).

Usage:
  python -m handsonvlm_tpu.eval.evaluate --model-path /ckpts/handsonvlm-7b \
      [--use-reason] [--ek-version ek100] [--split validation] [--limit N]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--preset", default="7b")
    p.add_argument("--ek-version", default="ek100")
    p.add_argument("--split", default="validation")
    p.add_argument("--use-reason", action="store_true")
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--max-new-tokens", type=int, default=100)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--kv-int8", action="store_true",
                   help="int8-quantized decode cache")
    p.add_argument("--num-samples", type=int, default=1,
                   help="stochastic decodes per clip (min/mean-over-samples)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder (memory; slight accuracy cost)")
    p.add_argument("--int4", action="store_true",
                   help="int4 group-wise weight-only decoder (more memory, more error)")
    p.add_argument("--out", default=None, help="json results path")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decode (distribution-exact; B=1 eval "
                        "is the protocol, so metrics are unchanged)")
    p.add_argument("--batched", type=int, default=0, metavar="SLOTS",
                   help="route decodes through the continuous-batching "
                        "engine with SLOTS shared-decode slots (aggregate "
                        "throughput; per-sample streams are composition-"
                        "independent so scoring is unchanged)")
    p.add_argument("--batched-max-len", type=int, default=4096)
    p.add_argument("--batched-chunk", type=int, default=16)
    args = p.parse_args()

    from handsonvlm_tpu.data.epic_dataset import (
        EpicConversationDataset,
        EpicReasoningConversationDataset,
    )
    from handsonvlm_tpu.data.epic_structures import get_epic_hoi_dataset_by_name
    from handsonvlm_tpu.eval.evaluator import InferenceEngine, evaluate_epic_kitchen_traj
    from handsonvlm_tpu.infer.builder import load_pretrained_model

    params, cfg, tokenizer = load_pretrained_model(
        args.model_path, args.preset, quantize="int8" if args.int8 else ("int4" if args.int4 else None)
    )

    rephrase_rate = 1.0 if args.use_reason else 0.0
    hoi = get_epic_hoi_dataset_by_name(
        args.ek_version, args.split, load_images=True,
        rephrase_rate=rephrase_rate, use_wrong_narration=False, use_percentage=1.0,
    )
    ds_cls = EpicReasoningConversationDataset if args.use_reason else EpicConversationDataset
    dataset = ds_cls(tokenizer, hoi, deterministic=True)

    engine = InferenceEngine(
        params=params, cfg=cfg, tokenizer=tokenizer,
        temperature=args.temperature, top_p=args.top_p,
        max_new_tokens=args.max_new_tokens, spec_k=args.spec,
        kv_quant="int8" if args.kv_int8 else None,
    )
    result = evaluate_epic_kitchen_traj(
        engine, dataset, seed=args.seed, limit=args.limit,
        num_samples=args.num_samples, batched=args.batched,
        batched_max_len=args.batched_max_len, batched_chunk=args.batched_chunk,
    )
    summary = {k: result[k] for k in ("ade", "fde", "wde", "n")}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
