"""One-command real-asset parity harness (the BASELINE.md north star).

Metric-level EK100 parity with the released HandsOnVLM-7B weights is
blocked in this environment (no checkpoint, no Vicuna tokenizer.model, no
EPIC frames). Everything it needs is oracle-tested on synthetic stand-ins;
this script turns the real run into ONE command for the day the assets
exist:

  python tools/parity_real.py --checkpoint /ckpts/handsonvlm-7b \
      [--hf-tokenizer-backend auto] [--epic-version ek100] [--limit 10] \
      [--prompt "..."] [--out parity.json]

Steps (each reports PASS/FAIL/SKIPPED; missing assets skip, not crash):

1. tokenizer — our dependency-free sentencepiece loader
   (data/spm_model.SentencePieceModel via tokenization.SpmHFShim) vs the
   installed `sentencepiece`/`transformers` tokenizer on the SAME
   tokenizer.model, token-ids diffed over a text battery (EK answer
   templates, unicode, digits, whitespace edge cases). Reference files:
   the Vicuna tokenizer the released checkpoints ship
   (handsonvlm/model/builder.py tokenizer load).
2. logits — checkpoint converted by convert/hf_to_jax, our text-only
   forward vs an HF torch LlamaForCausalLM forward on the same directory
   (language tower only: the multimodal splice is oracle-tested in
   tests/test_handsonvlm_forward.py); reports max |logit diff| at the
   final position. Reference: handsonvlm/evaluation uses the same LM head.
3. eval — N-sample EK100 ADE/FDE via eval.evaluator (the full protocol:
   sampled decode at temp 0.5, zero-pad/last-4 clipping, swap-quirk
   scorer). Prints the metrics to compare against the paper/BASELINE.md.

--dryrun exercises steps 1-3 end-to-end on synthetic assets (a tiny spm
model + a tiny HF checkpoint written by convert/jax_to_hf + the synthetic
EK fixture from tests/test_e2e_eval_cli for BOTH eval splits — vanilla and
reasoning) so the harness itself stays green in CI
(tests/test_parity_real.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Released-asset manifest (reference README.md:47-52 weights table). No
# published checksums exist upstream; we pin the HF repo ids + the file set
# the loaders require, and RECORD sha256 of what is found so a later run can
# diff against a known-good download.
EXPECTED_ASSETS = {
    "7b": {
        "hf_repo": "Kami-code/handsonvlm-7b",
        "llm_base": "lmsys/vicuna-7b-v1.3",
        "required": ["config.json", "tokenizer.model"],
        # either a sharded torch checkpoint or safetensors satisfies the
        # converter (convert/hf_to_jax.load_state_dict)
        "weights_any": ["pytorch_model.bin.index.json",
                        "model.safetensors.index.json",
                        "pytorch_model.bin", "model.safetensors"],
    },
    "13b": {
        "hf_repo": "Kami-code/handsonvlm-13b",
        "llm_base": "lmsys/vicuna-13b-v1.3",
        "required": ["config.json", "tokenizer.model"],
        "weights_any": ["pytorch_model.bin.index.json",
                        "model.safetensors.index.json",
                        "pytorch_model.bin", "model.safetensors"],
    },
}


def step_assets(checkpoint: str, preset: str) -> dict:
    """Presence + checksum record for the released-weights file set, so the
    day the environment grants assets the command reports exactly what is
    missing (and fingerprints what is there) with zero edits."""
    import hashlib

    manifest = EXPECTED_ASSETS.get(preset, EXPECTED_ASSETS["7b"])
    found, missing, sums = [], [], {}
    for name in manifest["required"]:
        path = os.path.join(checkpoint, name) if checkpoint else name
        if checkpoint and os.path.exists(path):
            found.append(name)
            if os.path.getsize(path) < 64 * 2**20:  # fingerprint small files
                with open(path, "rb") as f:
                    sums[name] = hashlib.sha256(f.read()).hexdigest()
        else:
            missing.append(name)
    weights = [n for n in manifest["weights_any"]
               if checkpoint and os.path.exists(os.path.join(checkpoint, n))]
    status = "PASS" if not missing and weights else "SKIPPED"
    return {
        "step": "assets", "status": status,
        "hf_repo": manifest["hf_repo"], "llm_base": manifest["llm_base"],
        "found": found, "missing": missing,
        "weights_found": weights, "sha256": sums,
        "note": None if status == "PASS" else
        f"download {manifest['hf_repo']} (HF) into --checkpoint",
    }


BATTERY = [
    "Where should my hand move to if I want to open the fridge?",
    "The hand should move to <hand_traj> <hand_traj> <hand_traj> <hand_traj>.",
    "naïve café — résumé; 名前は何ですか 123,456.789",
    "  leading spaces\tand\ttabs\nnewlines  ",
    "a",
    "",
    "word " * 50,
    "<s> literal angle tokens </s> <unk>",
]


def step_tokenizer(spm_path: str, backend: str = "auto") -> dict:
    """Token-level diff: our loader vs sentencepiece/transformers."""
    from handsonvlm_tpu.data.spm_model import SentencePieceModel

    ours = SentencePieceModel.load(spm_path)
    ref_encode = None
    ref_name = None
    if backend in ("auto", "sentencepiece"):
        try:
            import sentencepiece as spm  # type: ignore

            sp = spm.SentencePieceProcessor(model_file=spm_path)
            ref_encode, ref_name = sp.encode, "sentencepiece"
        except Exception:
            pass
    if ref_encode is None and backend in ("auto", "transformers"):
        try:
            from transformers import LlamaTokenizer  # type: ignore

            t = LlamaTokenizer(vocab_file=spm_path, legacy=True)
            ref_encode = lambda s: t.encode(s, add_special_tokens=False)  # noqa: E731
            ref_name = "transformers.LlamaTokenizer"
        except Exception:
            pass

    diffs, total = [], 0
    roundtrip_fail = []
    for text in BATTERY:
        ids = ours.encode(text)
        total += 1
        # round-trip is only lossless when every char is representable:
        # byte-fallback models (Vicuna) always are; without it, skip texts
        # that hit <unk>. Whitespace-normalized compare (spm collapses runs).
        representable = ours.byte_fallback or ours.unk_id not in ids
        if representable and (" ".join(ours.decode(ids).split())
                              != " ".join(text.split())):
            roundtrip_fail.append(text[:40])
        if ref_encode is not None:
            ref_ids = list(ref_encode(text))
            if list(ids) != ref_ids:
                diffs.append({"text": text[:60], "ours": list(ids)[:20],
                              "ref": ref_ids[:20]})
    out = {
        "step": "tokenizer",
        "reference_backend": ref_name,
        "texts": total,
        "id_mismatches": len(diffs) if ref_encode else None,
        "roundtrip_failures": roundtrip_fail,
        "examples": diffs[:3],
    }
    if ref_encode is None:
        out["status"] = ("PASS(roundtrip-only)" if not roundtrip_fail
                         else "FAIL")
        out["note"] = ("no sentencepiece/transformers backend importable — "
                       "round-trip checked only")
    else:
        out["status"] = "PASS" if not diffs and not roundtrip_fail else "FAIL"
    return out


def step_logits(checkpoint: str, preset: str, prompt: str,
                atol: float = 5e-2) -> dict:
    """Converted-weights text-only forward vs HF torch on the same files.

    bf16 checkpoints accumulate ~1e-2-scale logit differences between
    XLA and torch kernels; `atol` bounds the max |diff| at the final
    position. Rank agreement (argmax match) is the hard criterion."""
    import numpy as np

    from handsonvlm_tpu.infer.builder import load_pretrained_model
    from handsonvlm_tpu.models.llama import apply_llama, lm_logits

    params, cfg, tokenizer = load_pretrained_model(checkpoint, preset)
    ids = [tokenizer.bos_token_id] if hasattr(tokenizer, "bos_token_id") else [1]
    ids = ids + list(tokenizer.encode(prompt))[:64]

    import jax.numpy as jnp

    hidden, _ = apply_llama(
        params["llama"], cfg.llama, input_ids=jnp.asarray([ids]))
    ours = np.asarray(lm_logits(params["llama"], cfg.llama,
                                hidden[:, -1:, :]))[0, 0]

    try:
        import torch
        from transformers import AutoModelForCausalLM

        with torch.no_grad():
            m = AutoModelForCausalLM.from_pretrained(
                checkpoint, torch_dtype=torch.float32,
                trust_remote_code=False)
            ref = m(torch.tensor([ids])).logits[0, -1].numpy()
    except Exception as e:  # noqa: BLE001
        return {"step": "logits", "status": "SKIPPED",
                "note": f"HF torch load failed: {type(e).__name__}: "
                        f"{str(e)[:200]}"}
    v = min(ours.shape[-1], ref.shape[-1])  # ours pads vocab to a multiple
    diff = float(np.abs(ours[:v] - ref[:v]).max())
    return {
        "step": "logits",
        "max_abs_diff": diff,
        "argmax_match": bool(np.argmax(ours[:v]) == np.argmax(ref[:v])),
        "status": "PASS" if diff < atol
        and np.argmax(ours[:v]) == np.argmax(ref[:v]) else "FAIL",
    }


def step_eval(checkpoint: str, preset: str, limit: int, ek_version: str,
              quantize=None, use_reason: bool = False,
              params_cfg_tok=None) -> dict:
    """One eval split. `use_reason` mirrors the reference's two commands
    (README.md:81-82): the reasoning split uses the GPT-rephrased question
    bank (rephrase_rate=1) + EpicReasoningConversationDataset
    (handsonvlm_inference.py:127-141); vanilla uses rephrase_rate=0."""
    from handsonvlm_tpu.data.epic_dataset import (
        EpicConversationDataset,
        EpicReasoningConversationDataset,
    )
    from handsonvlm_tpu.data.epic_structures import get_epic_hoi_dataset_by_name
    from handsonvlm_tpu.eval.evaluator import (
        InferenceEngine,
        evaluate_epic_kitchen_traj,
    )
    from handsonvlm_tpu.infer.builder import load_pretrained_model

    if params_cfg_tok is None:
        params_cfg_tok = load_pretrained_model(checkpoint, preset,
                                               quantize=quantize)
    params, cfg, tokenizer = params_cfg_tok
    hoi = get_epic_hoi_dataset_by_name(
        ek_version, "validation", load_images=True,
        rephrase_rate=1.0 if use_reason else 0.0,
        use_wrong_narration=False, use_percentage=1.0)
    ds_cls = (EpicReasoningConversationDataset if use_reason
              else EpicConversationDataset)
    dataset = ds_cls(tokenizer, hoi, deterministic=True)
    engine = InferenceEngine(params=params, cfg=cfg, tokenizer=tokenizer)
    result = evaluate_epic_kitchen_traj(engine, dataset, limit=limit)
    return {"step": f"eval({'reason' if use_reason else 'vanilla'})",
            "status": "DONE",
            "ade": result["ade"], "fde": result["fde"],
            "wde": result["wde"], "n": result["n"],
            "note": "compare against BASELINE.md / paper table"}


def dryrun_eval_splits(tmp: str) -> list:
    """Synthetic BOTH-splits eval pass (VERDICT r4 #8): the EK fixture +
    rigged tiny checkpoint from tests/test_e2e_eval_cli drive step_eval for
    vanilla AND reasoning, so the real-asset command path (dataset class
    selection, rephrase bank, scorer) is exercised end-to-end in CI."""
    import pathlib

    from tests.test_e2e_eval_cli import _rigged_checkpoint, _write_fixture

    root = pathlib.Path(tmp) / "ek_fixture"
    root.mkdir()
    _write_fixture(root)
    ckpt = _rigged_checkpoint(pathlib.Path(tmp))
    os.environ["HANDSONVLM_DATA_ROOT"] = str(root)
    os.environ["HANDSONVLM_ASSETS_DIR"] = str(root / "assets")

    from handsonvlm_tpu.infer.builder import load_pretrained_model

    pct = load_pretrained_model(ckpt, "tiny224")
    out = []
    for use_reason in (False, True):
        r = step_eval(ckpt, "tiny224", limit=2, ek_version="ek100",
                      use_reason=use_reason, params_cfg_tok=pct)
        r["step"] += "(dryrun)"
        ok = r["n"] == 2 and all(
            0.0 <= r[k] < 10.0 for k in ("ade", "fde", "wde"))
        r["status"] = "PASS" if ok else "FAIL"
        out.append(r)
    return out


def dryrun(tmp: str) -> list:
    """Synthetic end-to-end pass over steps 1-3 (no real assets)."""
    import jax

    from handsonvlm_tpu.convert.jax_to_hf import save_hf_checkpoint
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
    from tests.test_spm_model import TINY_VOCAB, build_model_bytes, llama_like_pieces

    spm_path = os.path.join(tmp, "tokenizer.model")
    with open(spm_path, "wb") as f:
        f.write(build_model_bytes(llama_like_pieces(TINY_VOCAB)))
    r1 = step_tokenizer(spm_path)

    cfg = tiny_config()
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
    save_hf_checkpoint(params, ckpt)
    # converted-back forward must reproduce the original params' logits
    # bit-near-exactly — validates the checkpoint->convert->forward plumb
    import numpy as np

    from handsonvlm_tpu.convert.hf_to_jax import convert_handsonvlm, load_state_dict
    from handsonvlm_tpu.models.llama import apply_llama, lm_logits
    import jax.numpy as jnp

    back = convert_handsonvlm(load_state_dict(ckpt), cfg)
    ids = jnp.asarray([[1, 5, 9, 4, 2]])
    h0, _ = apply_llama(params["llama"], cfg.llama, input_ids=ids)
    h1, _ = apply_llama(back["llama"], cfg.llama, input_ids=ids)
    a = np.asarray(lm_logits(params["llama"], cfg.llama, h0[:, -1:, :]))
    b = np.asarray(lm_logits(back["llama"], cfg.llama, h1[:, -1:, :]))
    diff = float(np.abs(a - b).max())
    r2 = {"step": "logits(dryrun)", "max_abs_diff": diff,
          "status": "PASS" if diff == 0.0 else "FAIL"}
    return [r1, r2] + dryrun_eval_splits(tmp)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="HF HandsOnVLM checkpoint dir (tokenizer.model inside)")
    p.add_argument("--preset", default="7b")
    p.add_argument("--tokenizer-model", default=None,
                   help="explicit tokenizer.model path (default: in checkpoint)")
    p.add_argument("--hf-tokenizer-backend", default="auto",
                   choices=["auto", "sentencepiece", "transformers"])
    p.add_argument("--prompt", default="Where should my hand move to if I "
                                       "want to open the fridge?")
    p.add_argument("--ek-version", default="ek100")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--skip-eval", action="store_true")
    p.add_argument("--splits", default="vanilla,reason",
                   help="comma list of eval splits to run (vanilla|reason) — "
                        "mirrors the reference's two evaluate commands "
                        "(README.md:81-82, --use_reason)")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--dryrun", action="store_true",
                   help="synthetic assets, steps 1-2 only (CI smoke)")
    args = p.parse_args()

    results = []
    if args.dryrun:
        import tempfile

        import jax

        # synthetic smoke must not burn (or depend on) the real chip; env
        # vars do not override the sitecustomize platform pin (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
        with tempfile.TemporaryDirectory() as tmp:
            results = dryrun(tmp)
    else:
        spm = args.tokenizer_model or (
            os.path.join(args.checkpoint, "tokenizer.model")
            if args.checkpoint else None)
        if spm and os.path.exists(spm):
            results.append(step_tokenizer(spm, args.hf_tokenizer_backend))
        else:
            results.append({"step": "tokenizer", "status": "SKIPPED",
                            "note": f"no tokenizer.model at {spm}"})
        results.append(step_assets(args.checkpoint, args.preset))
        if args.checkpoint and os.path.isdir(args.checkpoint):
            results.append(step_logits(args.checkpoint, args.preset,
                                       args.prompt))
            if not args.skip_eval:
                pct = None
                for split in [s.strip() for s in args.splits.split(",") if s]:
                    try:
                        if pct is None:
                            # load ONCE across splits: freed device buffers
                            # never return to the allocator on this backend
                            # (CLAUDE.md) — a second 7B load would OOM
                            from handsonvlm_tpu.infer.builder import (
                                load_pretrained_model,
                            )

                            pct = load_pretrained_model(
                                args.checkpoint, args.preset,
                                quantize="int4" if args.int4 else None)
                        r = step_eval(
                            args.checkpoint, args.preset, args.limit,
                            args.ek_version,
                            use_reason=(split == "reason"),
                            params_cfg_tok=pct)
                        results.append(r)
                    except Exception as e:  # noqa: BLE001
                        results.append({"step": f"eval({split})",
                                        "status": "SKIPPED",
                                        "note": f"{type(e).__name__}: "
                                                f"{str(e)[:200]}"})
        else:
            results.append({"step": "logits", "status": "SKIPPED",
                            "note": "no --checkpoint"})

    for r in results:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    bad = [r for r in results if r.get("status") == "FAIL"]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
