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

import jax
import jax.numpy as jnp
import numpy as np

from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.infer.speculative import build_template_bank, generate_spec


def test_spec_accepts_at_sampling_temperature():
    from tools.spec_harness import memorize_template

    cfg = tiny_config()
    tok = MockTokenizer()
    narr = "open the fridge"
    state, inst, cut, m = memorize_template(cfg, tok, narr, steps=130)
    text_loss = float(m["text_loss"])
    assert text_loss < 0.3, f"memorization failed, text_loss={text_loss}"

    img = inst["image"]
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
