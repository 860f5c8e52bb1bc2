"""Interactive chat CLI with hand-trajectory decoding.

Reference: handsonvlm/evaluation/chat.py + HandsOnVLMInference.
user_input_inference (handsonvlm_inference.py:187-229): load an image/mp4,
chat until the model emits <hand_traj> tokens, then render the predicted
trajectory video.

Usage:
  python -m handsonvlm_tpu.infer.chat --model-path random:tiny \
      --path docs/epic_kitchen.jpg --output-video ./traj.mp4
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--preset", default="7b")
    p.add_argument("--path", required=True, help="image (.jpg/.png) or video (.mp4)")
    p.add_argument("--output-video", default="./trajectory.mp4")
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--max-new-tokens", type=int, default=100)
    p.add_argument("--int8", action="store_true", help="int8 weight-only decoder")
    p.add_argument("--int4", action="store_true", help="int4 (group-128) weight-only decoder")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8-quantized decode cache")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decode with K-token n-gram drafts over "
                        "a template bank + history (infer/speculative.py; "
                        "exact sampling semantics, no streaming)")
    args = p.parse_args()

    import jax

    from handsonvlm_tpu.constants import DEFAULT_IMAGE_TOKEN
    from handsonvlm_tpu.data.conversation import conv_templates
    from handsonvlm_tpu.data.tokenization import tokenizer_image_token
    from handsonvlm_tpu.data.video_io import load_image, load_video
    from handsonvlm_tpu.eval.evaluator import InferenceEngine
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.infer.sampler import clip_pred_hands, generate_host
    from handsonvlm_tpu.infer.viz import create_trajectory_video

    params, cfg, tokenizer = load_pretrained_model(
        args.model_path, args.preset, quantize="int8" if args.int8 else ("int4" if args.int4 else None)
    )

    # frames: 10 unique, repeated to fill the num_frames interface
    # (epic_dataset.py:89-95 tiling, generalized to any frame budget)
    size = cfg.vision.image_size
    n_unique = min(10, cfg.num_frames)
    if args.path.endswith((".png", ".jpg", ".jpeg")):
        frame = load_image(args.path, cache_dir=None, size=size)
        frames = np.tile(frame[None], (n_unique, 1, 1, 1))
        frame_paths = [args.path] * n_unique
    elif args.path.endswith(".mp4"):
        frames = load_video(args.path, num_frames=n_unique, size=size)
        frame_paths = [args.path]
    else:
        raise ValueError(f"unsupported input {args.path}")
    # keep only the unique frames and a slot->frame map: CLIP encodes
    # U frames instead of num_frames (bit-identical, see encode_video)
    if cfg.num_frames % frames.shape[0]:
        frame_map = np.round(
            np.linspace(0, frames.shape[0] - 1, cfg.num_frames)
        ).astype(np.int32)
    else:
        reps = cfg.num_frames // frames.shape[0]
        frame_map = np.tile(np.arange(frames.shape[0], dtype=np.int32), reps)
    video = frames[None]

    conv = conv_templates["v1"].copy()
    rng = jax.random.PRNGKey(0)
    first = True
    while True:
        try:
            user_input = input(f"{conv.roles[0]}: ")
        except EOFError:
            user_input = ""
        if not user_input:
            print("exit...")
            return
        if first:
            user_input = DEFAULT_IMAGE_TOKEN + "\n" + user_input
            first = False
        conv.append_message(conv.roles[0], user_input)
        conv.append_message(conv.roles[1], None)
        ids = np.asarray(
            tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64
        )[None]
        rng, step_rng = jax.random.split(rng)
        print(f"{conv.roles[1]}: ", end="", flush=True)

        def stream(tok_id):
            piece = tokenizer.decode([tok_id])
            print(piece, end=" ", flush=True)

        # stop on the conv separator like the reference cli's
        # KeywordsStoppingCriteria (llava/serve/cli.py, mm_utils.py:192-215)
        stop_str = conv.sep2 if conv.sep2 else conv.sep
        if args.spec:
            from handsonvlm_tpu.infer.speculative import (
                build_template_bank, generate_spec,
            )

            out, stats = generate_spec(
                params, cfg, ids, video.astype(np.float32), step_rng,
                max_new_tokens=args.max_new_tokens, k=args.spec,
                temperature=args.temperature, top_p=args.top_p,
                frame_map=frame_map,
                bank_ids=build_template_bank(tokenizer, cfg, (user_input,)),
                kv_quant="int8" if args.kv_int8 else None,
            )
            n0 = int(out.num_tokens[0])
            print(tokenizer.decode(np.asarray(out.sequences[0, :n0])),
                  f"  [{stats['tokens']} tok / {stats['iters']} fwd]")
        else:
            out = generate_host(
                params, cfg, ids, video.astype(np.float32), step_rng,
                max_new_tokens=args.max_new_tokens,
                temperature=args.temperature, top_p=args.top_p,
                frame_map=frame_map, on_token=stream,
                stop_strs=[stop_str] if stop_str else None, tokenizer=tokenizer,
                kv_quant="int8" if args.kv_int8 else None,
            )
        print()
        n = int(out.num_tokens[0])
        text = tokenizer.decode(np.asarray(out.sequences[0, :n]))
        conv.messages[-1][1] = text
        pred, valid = clip_pred_hands(
            np.asarray(out.pred_hands), np.asarray(out.num_hands)
        )
        if valid[0]:
            if frame_paths[0].endswith(".mp4"):
                print("trajectory predicted; video overlay requires frame input")
            else:
                path = create_trajectory_video(frame_paths, pred[0], args.output_video)
                print(f"trajectory video written to {path}")
            return


if __name__ == "__main__":
    main()
