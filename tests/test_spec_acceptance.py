"""Speculative acceptance at the EVAL-PROTOCOL temperature (0.5).

Round-2 open question (ROADMAP 'spec needs real weights to show up'):
random-weight logits reject every draft at temp 0.5, so spec measured
BELOW sequential at the eval protocol. This test closes the mechanism
question without real checkpoints: once the model's distribution matches
the template bank (trained to memorize one EK answer template — the real
7B was SFT-trained on exactly these template pools,
handsonvlm/dataset/epic_dataset.py), acceptance at temp 0.5 appears and
spec emits substantially more than one token per forward.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from handsonvlm_tpu.constants import (
    ACTION_QUESTION_TEMPLATES,
    DEFAULT_IMAGE_TOKEN,
    GENERAL_TRAJECTORY_ANSWER_TEMPLATES,
    HAND_TOKEN_TEMPLATE,
)
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.data.hybrid_dataset import Collator
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.data.tokenization import preprocess_multimodal, preprocess_v1
from handsonvlm_tpu.infer.speculative import build_template_bank, generate_spec
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.train.step import make_train_step
from handsonvlm_tpu.train.train_state import TrainState


def test_spec_accepts_at_sampling_temperature():
    cfg = tiny_config()
    tok = MockTokenizer()
    narr = "open the fridge"
    question = ACTION_QUESTION_TEMPLATES[0].format(narr)
    answer = GENERAL_TRAJECTORY_ANSWER_TEMPLATES[0].format(HAND_TOKEN_TEMPLATE * 4)
    source = [
        {"from": "human", "value": DEFAULT_IMAGE_TOKEN + "\n" + question},
        {"from": "gpt", "value": answer},
    ]
    tokd = preprocess_v1(
        preprocess_multimodal(copy.deepcopy([source])), tok, has_image=True)
    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    img = rng.normal(size=(cfg.num_frames, 3, size, size)).astype(np.float32)
    inst = {
        "input_ids": tokd["input_ids"][0], "labels": tokd["labels"][0],
        "image": img,
        "future_hands": rng.uniform(size=(2, 5, 2)).astype(np.float32),
        "contact_point": rng.uniform(size=(2,)).astype(np.float32),
        "future_valid": np.ones((2,), np.float32),
    }
    coll = Collator(pad_token_id=tok.pad_token_id,
                    model_max_length=cfg.max_length, num_frames=cfg.num_frames)
    batch = coll([copy.deepcopy(inst) for _ in range(4)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "prompt"}

    params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(5e-3)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(cfg, tx, attn_impl="xla")
    for i in range(130):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    text_loss = float(m["text_loss"])
    assert text_loss < 0.3, f"memorization failed, text_loss={text_loss}"

    lab = np.asarray(inst["labels"])
    cut = int(np.argmax(lab != -100))
    ids = np.asarray(inst["input_ids"])[None][:, :cut]
    bank = build_template_bank(tok, cfg, (narr,))

    tot_tok = tot_fwd = 0
    hist = np.zeros(6, np.int64)
    for seed in range(3):
        out, stats = generate_spec(
            state.params, cfg, ids, jnp.asarray(img[None]),
            jax.random.PRNGKey(seed), max_new_tokens=20, k=4,
            temperature=0.5, top_p=0.9, bank_ids=bank, attn_impl="xla")
        tot_tok += stats["tokens"]
        tot_fwd += stats["iters"]
        hist += np.asarray(stats["accept_hist"])
    rate = tot_tok / max(tot_fwd, 1)
    # measured 1.78 tok/fwd; generous margin for seed/oss variation
    assert rate >= 1.3, (rate, hist.tolist())
    # histogram telemetry is consistent and shows multi-token acceptances:
    # hist counts per-forward emissions; the first token of each run is
    # sampled from prefill (not a spec forward), and reported `tokens` may
    # be EOS/max_new-truncated below the raw emission count
    assert hist.sum() == tot_fwd
    assert int(np.dot(np.arange(6), hist)) + 3 >= tot_tok
    assert hist[2:].sum() > 0, hist.tolist()
