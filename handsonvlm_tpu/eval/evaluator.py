"""EK100 trajectory evaluation harness.

Replaces `handsonvlm/evaluation/handsonvlm_inference.py:22-174` with the
cached sampler (math-identical decode; see infer/sampler.py). Protocol:
deterministic Epic[Reasoning]ConversationDataset, bs 1, sampled decode
(temperature 0.5, top-p 0.9, <=100 new tokens), predictions clipped/padded
to 4 steps (zero-pad / last-4), scored by the stochastic ADE/FDE/WDE with
the reference's name swap.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import DEFAULT_IMAGE_TOKEN
from handsonvlm_tpu.core.config import HandsOnVLMConfig
from handsonvlm_tpu.data.conversation import conv_templates
from handsonvlm_tpu.data.tokenization import tokenizer_image_token
from handsonvlm_tpu.eval.traj_metrics import evaluate_traj_stochastic
from handsonvlm_tpu.infer.sampler import clip_pred_hands, generate_chunked


@dataclasses.dataclass
class InferenceEngine:
    """Mirror of HandsOnVLMInference with the cached decode path."""

    params: dict
    cfg: HandsOnVLMConfig
    tokenizer: object
    conv_mode: str = "v1"
    temperature: float = 0.5
    top_p: float = 0.9
    max_new_tokens: int = 100
    pad_prompt_multiple: int = 32  # bucket prompt length to bound recompiles
    spec_k: int = 0  # >0: B=1 requests use speculative decode with K drafts
    kv_quant: object = None  # "int8": quantized decode cache (QuantKVCache)

    def build_prompt_ids(self, question: str, history=()) -> np.ndarray:
        """`history` is past turns [(user, assistant), ...] for multi-turn
        chat (gradio_web_server conversation state); the <image> token goes
        on the FIRST human turn only (preprocess_multimodal contract)."""
        conv = conv_templates[self.conv_mode].copy()
        for j, (user, assistant) in enumerate(history):
            text = DEFAULT_IMAGE_TOKEN + "\n" + user if j == 0 else user
            conv.append_message(conv.roles[0], text)
            conv.append_message(conv.roles[1], assistant)
        q = question if history else DEFAULT_IMAGE_TOKEN + "\n" + question
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        return np.asarray(ids, np.int64)[None, :]

    @staticmethod
    def dedup_frames(images: np.ndarray):
        """(B,T,...) -> (unique images (B,U,...), frame_map) when frames
        repeat (the EK protocol tiles 10 unique frames x10,
        epic_dataset.py:89-95); CLIP then runs U frames instead of T.

        B==1 returns a shared (T,) map; B>1 dedups per row and returns a
        (B,T) map (rows with fewer uniques repeat their first unique frame
        to pad to the batch max U — the map never indexes the padding).
        Returns (images, None) when nothing repeats."""
        b, t = images.shape[:2]
        maps = np.empty((b, t), np.int32)
        uniqs = []
        for r in range(b):
            seen: dict = {}
            uniq = []
            for i in range(t):
                key = images[r, i].tobytes()
                if key not in seen:
                    seen[key] = len(uniq)
                    uniq.append(i)
                maps[r, i] = seen[key]
            uniqs.append(uniq)
        u_max = max(len(u) for u in uniqs)
        if u_max == t:
            return images, None
        out = np.empty((b, u_max) + images.shape[2:], images.dtype)
        for r, uniq in enumerate(uniqs):
            out[r, : len(uniq)] = images[r, uniq]
            out[r, len(uniq):] = images[r, uniq[0]]
        if b == 1:
            return out, maps[0]
        return out, maps

    def _pad_to_bucket(self, id_rows):
        """LEFT-pad rows to a shared bucket: one jit compile per bucket, and
        the final prompt position stays real content (rotary attention is
        relative, so left padding is logit-exact; right padding would sample
        the first token from a pad-query position)."""
        m = self.pad_prompt_multiple
        t_max = max(r.shape[0] for r in id_rows)
        bucket = ((t_max + m - 1) // m) * m
        b = len(id_rows)
        ids = np.full((b, bucket), self.tokenizer.pad_token_id, np.int64)
        attn = np.zeros((b, bucket), bool)
        for i, r in enumerate(id_rows):
            ids[i, bucket - r.shape[0]:] = r
            attn[i, bucket - r.shape[0]:] = True
        return ids, attn

    def infer(self, question: str, images: np.ndarray, rng: jax.Array, params=None,
              history=(), *, temperature=None, top_p=None, max_new_tokens=None):
        """question + (1,100,3,224,224) frames -> (pred (1,2,4,2), valid,
        generated ids). ``params`` overrides self.params for this call
        (serving LoRA hot-swap: serve/lora_registry.py); ``history`` adds
        past turns for multi-turn chat. ``temperature``/``top_p``/
        ``max_new_tokens`` override the engine defaults for THIS call only
        (serving passes per-request options; mutating the shared engine
        attributes would race across concurrent request threads)."""
        preds, valids, gen = self.infer_batch(
            [question], images, rng, params=params, histories=[history],
            temperature=temperature, top_p=top_p, max_new_tokens=max_new_tokens,
        )
        return preds, valids, gen[0]

    def infer_batch(self, questions, images: np.ndarray, rng: jax.Array, params=None,
                    histories=None, *, temperature=None, top_p=None,
                    max_new_tokens=None):
        """Batched decode for serving: B questions + (B,T,...) frames ->
        (pred (B,2,4,2), valid (B,), [gen_ids per row])."""
        histories = histories or [()] * len(questions)
        temperature = self.temperature if temperature is None else temperature
        top_p = self.top_p if top_p is None else top_p
        max_new_tokens = (
            self.max_new_tokens if max_new_tokens is None else max_new_tokens)
        rows = [
            self.build_prompt_ids(q, h)[0] for q, h in zip(questions, histories)
        ]
        ids, attn = self._pad_to_bucket(rows)
        images, frame_map = self.dedup_frames(np.asarray(images))
        if self.spec_k > 0 and len(rows) == 1:
            return self._infer_spec(
                ids, attn, images, frame_map, rng, params,
                temperature=temperature, top_p=top_p,
                max_new_tokens=max_new_tokens)
        out = generate_chunked(
            self.params if params is None else params,
            self.cfg,
            jnp.asarray(ids),
            jnp.asarray(images, self.cfg.cdtype),
            rng,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            attn_mask=attn,
            frame_map=frame_map,
            kv_quant=self.kv_quant,
        )
        pred, valid = clip_pred_hands(
            jax.device_get(out.pred_hands), jax.device_get(out.num_hands)
        )
        nums = jax.device_get(out.num_tokens)
        seqs = jax.device_get(out.sequences)
        gen_ids = [np.asarray(seqs[i, : int(nums[i])]) for i in range(len(rows))]
        return pred, valid, gen_ids

    def _infer_spec(self, ids, attn, images, frame_map, rng, params, *,
                    temperature=None, top_p=None, max_new_tokens=None):
        """B=1 latency path: speculative decode with a template-bank draft
        (infer/speculative.py; distribution-exact, so eval metrics keep
        their sampling semantics)."""
        from handsonvlm_tpu.infer.speculative import (
            build_template_bank,
            generate_spec,
        )

        temperature = self.temperature if temperature is None else temperature
        top_p = self.top_p if top_p is None else top_p
        max_new_tokens = (
            self.max_new_tokens if max_new_tokens is None else max_new_tokens)
        if not hasattr(self, "_spec_bank"):
            self._spec_bank = build_template_bank(self.tokenizer, self.cfg)
        out, _stats = generate_spec(
            self.params if params is None else params,
            self.cfg, ids, jnp.asarray(images, self.cfg.cdtype), rng,
            max_new_tokens=max_new_tokens, k=self.spec_k,
            temperature=temperature, top_p=top_p,
            attn_mask=attn, frame_map=frame_map, bank_ids=self._spec_bank,
            kv_quant=self.kv_quant,
        )
        pred, valid = clip_pred_hands(
            jax.device_get(out.pred_hands), jax.device_get(out.num_hands)
        )
        n = int(jax.device_get(out.num_tokens)[0])
        gen_ids = [np.asarray(jax.device_get(out.sequences))[0, :n]]
        return pred, valid, gen_ids


def _infer_all_batched(engine: InferenceEngine, dataset, n: int,
                       num_samples: int, seed: int, slots: int,
                       max_len: int, chunk: int):
    """Run every (clip, sample) decode through the continuous-batching
    scheduler (serve/scheduler.py): `slots` requests share one decode batch
    and one weight stream per step instead of bs=1 serial decodes.

    Sound for scoring because the protocol is per-sample and stochastic:
    each row's rng and rotary positions are EXACT under composition
    (tests/test_continuous.py); logits differ only by floating-point
    reassociation (the row's keys sit at different global cache offsets
    per composition), whose ulp seeds grow through the KV-cache feedback
    over long generations — the same class of difference as changing the
    sampling seed, which the EK protocol (temp 0.5, evaluate_traj_
    stochastic) already averages over (tests/test_eval_batched.py). The
    reference harness is bs=1 serial (handsonvlm_inference.py:127-174).

    Returns {clip -> ([(pred, valid)] * num_samples, gen_ids_of_sample0)}.
    """
    import queue
    import threading

    from handsonvlm_tpu.serve.scheduler import ContinuousScheduler

    # admit_hold_s: the submit wave must coalesce into FULL-width fused
    # joins. Without it, arrival stagger fragments a 16-request burst into
    # a ragged sequence of narrow width classes — each a separate remote
    # compile (minutes at 7B) and a separate ~seconds join dispatch
    # (measured x0.5 vs serial from exactly this, docs/PERF_NOTES.md r5).
    # The scheduler is cached on the engine and REUSED across evaluate
    # calls: its slots cache is multi-GB (8.6 GB at S=8 x 4096 int8 KV, 7B)
    # and freed device memory never returns to the allocator on this
    # backend — a per-call scheduler allocates a fresh cache every run
    # (OOM or allocator-thrash), while one engine-owned scheduler matches
    # production use (one engine for the whole 3.5k-clip EK100 run). The
    # engine resets its cursor whenever all slots go idle, so back-to-back
    # runs stay bit-equal to a fresh engine.
    key = (slots, max_len, chunk)
    scheds = getattr(engine, "_batched_scheds", None)
    if scheds is None:
        scheds = engine._batched_scheds = {}
    sched = scheds.get(key)
    if sched is None:
        sched = ContinuousScheduler(
            engine.params, engine.cfg, slots=slots, max_len=max_len,
            chunk=chunk, temperature=engine.temperature, top_p=engine.top_p,
            kv_quant=engine.kv_quant, admit_hold_s=0.25)
        scheds[key] = sched
    results: Dict = {}
    errors = []
    n_consumers = max(2 * slots, 4)
    # request prep (tokenize, frame dedup, image upload) is seconds of
    # host work per clip at 100 frames — off the submit path, bounded
    # prefetch so EK100-scale runs never hold all clips on device at once;
    # one image upload per clip is SHARED across its num_samples requests
    prepared: queue.Queue = queue.Queue(maxsize=max(4 * slots, 8))

    def producer():
        try:
            for i in range(n):
                sample = dataset[i]
                # ids/frame_map stay HOST-side: submit() re-hosts ids with
                # np.asarray (a ~35 ms device_get per request if they were
                # uploaded) and the engine uploads frame_map at join time;
                # only the big frame tensor is pre-uploaded here
                ids = np.asarray(engine.build_prompt_ids(sample["prompt"]))
                images, fmap = engine.dedup_frames(
                    np.asarray(sample["image"][None]))
                images = jnp.asarray(images, engine.cfg.cdtype)
                for s in range(num_samples):
                    prepared.put((i, s, ids, images, fmap))
        except Exception as e:  # noqa: BLE001 — surface after join
            errors.append(("producer", -1, repr(e)))
        finally:
            for _ in range(n_consumers):
                prepared.put(None)

    def runner():
        while True:
            item = prepared.get()
            if item is None:
                return
            i, s, ids, images, fmap = item
            try:
                out = sched.submit(
                    ids, images,
                    seed=seed * 1_000_003 + i * num_samples + s,
                    max_new=engine.max_new_tokens,
                    frame_map=fmap, timeout=3600,
                )
                results[(i, s)] = out
            except Exception as e:  # noqa: BLE001 — surface after join
                errors.append((i, s, repr(e)))

    threads = [threading.Thread(target=producer)] + [
        threading.Thread(target=runner) for _ in range(n_consumers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # sched stays alive on the engine for the next evaluate call (daemon
    # loop thread; idle between runs costs nothing)
    if errors:
        raise RuntimeError(f"batched eval failed on {errors[:3]} "
                           f"(+{max(0, len(errors) - 3)} more)")

    clip_outputs = {}
    for i in range(n):
        sp = []
        for s in range(num_samples):
            out = results[(i, s)]
            pred_k, valid_k = clip_pred_hands(out.pred_hands, out.num_hands)
            sp.append((pred_k, valid_k))
        out0 = results[(i, 0)]
        n_tok = int(out0.num_tokens[0])
        clip_outputs[i] = (sp, np.asarray(out0.sequences[0, :n_tok]))
    return clip_outputs


def evaluate_epic_kitchen_traj(
    engine: InferenceEngine,
    dataset,
    seed: int = 0,
    log_every: int = 50,
    limit: Optional[int] = None,
    num_samples: int = 1,
    batched: int = 0,
    batched_max_len: int = 4096,
    batched_chunk: int = 16,
) -> Dict:
    """Loop a deterministic conversation dataset, score stochastic ADE/FDE.

    `dataset` is an Epic[Reasoning]ConversationDataset(deterministic=True).
    `num_samples` > 1 decodes each clip multiple times and scores the
    min/mean-over-samples protocol (the reference harness uses 1 decode per
    clip; the paper's stochastic metrics support multiple).
    `batched` > 0 routes decodes through the continuous-batching engine
    with that many slots (aggregate throughput; per-sample streams are
    composition-independent so scoring is unchanged — _infer_all_batched).
    Returns {'ade','fde','wde','n','val_info'}.
    """
    rng = jax.random.PRNGKey(seed)
    preds, gts, valids = [], [], []
    val_info = {}
    n = len(dataset) if limit is None else min(limit, len(dataset))
    clip_outputs = None
    if batched > 0:
        clip_outputs = _infer_all_batched(
            engine, dataset, n, num_samples, seed, batched,
            batched_max_len, batched_chunk)
    for i in range(n):
        sample = dataset[i]
        if clip_outputs is not None:
            sample_preds, gen_ids = clip_outputs[i]
        else:
            sample_preds = []
            for _ in range(num_samples):
                rng, step_rng = jax.random.split(rng)
                pred_k, valid_k, gen_ids = engine.infer(
                    sample["prompt"], sample["image"][None], step_rng
                )
                sample_preds.append((pred_k, valid_k))
        # a clip counts when every stochastic decode produced a trajectory
        valid = np.stack([v for _, v in sample_preds]).all(axis=0)
        pred = sample_preds[0][0]  # representative decode for val_info
        future_hands = np.asarray(sample["future_hands"])[None]  # (1,2,5,2)
        future_valid = np.asarray(sample["future_valid"])[None]  # (1,2)
        val_info[i] = {
            "pred_hand_trajectory": pred[None] if valid[0] else None,
            "pred_trajectory_is_valid": bool(valid[0]),
            "future_hands": future_hands,
            "future_valid": future_valid,
            "prompt": sample["prompt"],
            "text": engine.tokenizer.decode(gen_ids) if hasattr(engine.tokenizer, "decode") else None,
        }
        if valid[0]:
            stacked = np.stack([p for p, _ in sample_preds], axis=1)  # (1,S,2,4,2)
            preds.append(stacked)
            gts.append(future_hands[:, :, 1:, :])  # drop last-observed point
            valids.append(future_valid)
        if log_every and (i + 1) % log_every == 0 and preds:
            ade, fde, wde = evaluate_traj_stochastic(
                np.concatenate(preds), np.concatenate(gts), np.concatenate(valids)
            )
            print(f"[{i + 1}/{n}] ADE {ade:.4f} FDE {fde:.4f} WDE {wde:.4f}")

    if not preds:
        return {"ade": float("nan"), "fde": float("nan"), "wde": float("nan"), "n": 0, "val_info": val_info}
    ade, fde, wde = evaluate_traj_stochastic(
        np.concatenate(preds), np.concatenate(gts), np.concatenate(valids)
    )
    return {"ade": ade, "fde": fde, "wde": wde, "n": len(preds), "val_info": val_info}
