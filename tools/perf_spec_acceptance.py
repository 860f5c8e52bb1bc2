"""Speculative-decode acceptance under SAMPLING (the eval-protocol temp).

Round-2 finding: with RANDOM weights, spec at temperature 0.5 loses to
sequential (94.4 vs 110.5 tok/s) because random logits reject every
draft. This probe quantifies the other side: acceptance tracks how well
the model's distribution matches the template bank — the real 7B was
SFT-trained to emit exactly these template sentences
(handsonvlm/dataset/epic_dataset.py answer pools), so its acceptance at
temp 0.5 is the trained-model regime, not the random regime.

Modes:
  --train-tiny   controlled CPU experiment: memorize ONE EK template
                 (text_loss -> ~0.01, the in-distribution limit), then
                 sweep temperatures. Measured 2026-08-18: 1.78 tok/fwd at
                 temp 0.5 == greedy (random weights: 1.04-1.11).
  default        load weights (--model-path/--preset/--quant) and sweep
                 temperatures over EK-protocol prompts on the real chip;
                 reports tok/fwd, acceptance histogram, bank bigram
                 coverage of the emitted text.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_spec_acceptance.py \
      --train-tiny
  PYTHONPATH=... python tools/perf_spec_acceptance.py --preset 7b --quant int4
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bank_bigram_coverage(bank_ids, emitted_ids) -> float:
    """Fraction of emitted-token bigrams present in the bank buffer —
    an upper bound on what the n-gram draft could have proposed."""
    bank = np.asarray(bank_ids)
    bigrams = {(int(bank[i]), int(bank[i + 1])) for i in range(len(bank) - 1)}
    e = [int(t) for t in emitted_ids]
    if len(e) < 2:
        return 0.0
    hits = sum((e[i], e[i + 1]) in bigrams for i in range(len(e) - 1))
    return hits / (len(e) - 1)


def sweep(params, cfg, tok, ids, images, bank, temps, seeds, k, max_new):
    import jax
    import jax.numpy as jnp

    from handsonvlm_tpu.infer.speculative import generate_spec

    rows = []
    for temp in temps:
        tot_tok = tot_fwd = 0
        hist = None
        cov = []
        gated = []
        for seed in seeds:
            out, stats = generate_spec(
                params, cfg, ids, jnp.asarray(images), jax.random.PRNGKey(seed),
                max_new_tokens=max_new, k=k, temperature=temp, top_p=0.9,
                bank_ids=bank, attn_impl="auto",
            )
            tot_tok += stats["tokens"]
            tot_fwd += stats["iters"]
            h = np.asarray(stats["accept_hist"])
            hist = h if hist is None else hist + h
            n = int(out.num_tokens[0])
            cov.append(bank_bigram_coverage(bank, out.sequences[0, :n]))
            gated.append(bool(stats.get("gated", False)))
        rows.append({
            "temperature": temp,
            "tok_per_fwd": round(tot_tok / max(tot_fwd, 1), 3),
            "tokens": tot_tok,
            "forwards": tot_fwd,
            "accept_hist": [int(x) for x in hist],
            "bank_bigram_coverage": round(float(np.mean(cov)), 3),
            # acceptance-gate verdicts (one per seed): True = the probe
            # chunk measured < gate_tok_per_fwd and fell back to k=0
            "gated": gated,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_train_tiny(args):
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.infer.speculative import build_template_bank
    from tools.spec_harness import memorize_template

    cfg = tiny_config()
    tok = MockTokenizer()
    narr = "open the fridge"
    t0 = time.time()
    state, inst, cut, m = memorize_template(cfg, tok, narr, steps=args.steps)
    print(f"text_loss {float(m['text_loss']):.4f} after {args.steps} steps "
          f"({time.time() - t0:.0f}s)", flush=True)

    ids = np.asarray(inst["input_ids"])[None][:, :cut]
    bank = build_template_bank(tok, cfg, (narr,))
    # regime 1: trained/matched — acceptance well above the 1.2 gate
    # threshold, so the probe must NOT trip the k=0 fallback
    print("regime=trained (memorized template; expect gated=false)",
          flush=True)
    trained = sweep(state.params, cfg, tok, ids, inst["image"][None], bank,
                    temps=[0.5, 0.0], seeds=range(5), k=args.k, max_new=24)
    # regime 2: random weights — the round-2 losing case; the probe chunk
    # must measure ~1.0x acceptance and trip the gate (VERDICT r4 #9:
    # both gate verdicts demonstrated end-to-end in one run)
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

    rand = init_handsonvlm(jax.random.PRNGKey(7), cfg)
    print("regime=random (untrained weights; expect gated=true)", flush=True)
    random_rows = sweep(rand, cfg, tok, ids, inst["image"][None], bank,
                        temps=[0.5], seeds=range(5), k=args.k, max_new=24)
    ok_trained = not any(g for r in trained for g in r["gated"])
    ok_random = all(g for r in random_rows for g in r["gated"])
    print(json.dumps({"gate_decision_ok": {
        "trained_all_ungated": ok_trained,
        "random_all_gated": ok_random}}), flush=True)


def run_real(args):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/handsonvlm_jax")
    from handsonvlm_tpu.data.conversation import conv_templates
    from handsonvlm_tpu.data.tokenization import tokenizer_image_token
    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.infer.speculative import build_template_bank

    params, cfg, tok = load_pretrained_model(
        args.model_path or f"random:{args.preset}", args.preset,
        quantize=args.quant)
    conv = conv_templates["v1"].copy()
    conv.append_message(
        conv.roles[0],
        "<image>\nWhere should my hand move to if I want to open the fridge?")
    conv.append_message(conv.roles[1], None)
    ids = np.asarray(tokenizer_image_token(conv.get_prompt(), tok))[None]
    rng = np.random.default_rng(0)
    n_unique = min(10, cfg.num_frames)
    images = rng.normal(size=(
        1, n_unique, 3, cfg.vision.image_size, cfg.vision.image_size))
    # tiled frame_map protocol is used by bench; here unique frames only is
    # fine — acceptance depends on logits, not on vision input fidelity
    import dataclasses

    cfg = dataclasses.replace(cfg, num_frames=n_unique)
    bank = build_template_bank(tok, cfg, ("open the fridge",))
    sweep(params, cfg, tok, ids, images, bank,
          temps=[0.0, 0.25, 0.5, 0.75], seeds=range(3), k=args.k,
          max_new=args.max_new)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-tiny", action="store_true")
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--model-path", default=None)
    p.add_argument("--preset", default="7b")
    p.add_argument("--quant", default="int4")
    args = p.parse_args()
    if args.train_tiny:
        run_train_tiny(args)
    else:
        run_real(args)


if __name__ == "__main__":
    main()
