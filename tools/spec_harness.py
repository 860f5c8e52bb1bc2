"""Shared memorize-one-EK-template harness for speculative-acceptance
measurement (tools/perf_spec_acceptance.py) and its regression test
(tests/test_spec_acceptance.py).

Trains a tiny HandsOnVLM to memorize ONE EK answer template — the
in-distribution limit a real SFT'd model approaches on its own training
templates — so spec acceptance can be measured at sampling temperature
with weights whose distribution actually matches the template bank.
"""

from __future__ import annotations

import copy

import numpy as np


def build_template_instance(cfg, tok, narr: str):
    """One EK-templated (question, answer) training instance + its
    collated batch. Returns (inst, batch_numpy, prompt_cut) where
    prompt_cut is the index of the first supervised label (the prompt
    prefix to decode from)."""
    from handsonvlm_tpu.constants import (
        ACTION_QUESTION_TEMPLATES,
        DEFAULT_IMAGE_TOKEN,
        GENERAL_TRAJECTORY_ANSWER_TEMPLATES,
        HAND_TOKEN_TEMPLATE,
    )
    from handsonvlm_tpu.data.hybrid_dataset import Collator
    from handsonvlm_tpu.data.tokenization import (
        preprocess_multimodal,
        preprocess_v1,
    )

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
    lab = np.asarray(inst["labels"])
    cut = int(np.argmax(lab != -100))
    return inst, batch, cut


def memorize_template(cfg, tok, narr: str, steps: int, lr: float = 5e-3):
    """Train a fresh tiny model on the single-instance batch for `steps`
    adamw steps. Returns (state, inst, prompt_cut, last_metrics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
    from handsonvlm_tpu.train.step import make_train_step
    from handsonvlm_tpu.train.train_state import TrainState

    inst, batch, cut = build_template_instance(cfg, tok, narr)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "prompt"}
    params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(lr)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(cfg, tx, attn_impl="xla")
    m = {}
    for i in range(steps):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    return state, inst, cut, m
