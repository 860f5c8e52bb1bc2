"""Speculative decode: draft lookup, rejection-sampling exactness, e2e."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.infer.sampler import generate
from handsonvlm_tpu.infer.speculative import generate_spec, ngram_draft, spec_verify
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm

CFG = tiny_config()


def test_ngram_draft_lookup():
    buf = jnp.asarray([5, 6, 7, 8, 0, 5, 6, 9, 3, 0, 0, 0], jnp.int32)
    # latest (5,6) pair is at 5; draft follows it
    draft, found = ngram_draft(buf, jnp.asarray(9), 5, 6, 3)
    assert bool(found)
    np.testing.assert_array_equal(np.asarray(draft), [9, 3, 0])
    # pad beyond buf_len
    draft, found = ngram_draft(buf, jnp.asarray(9), 6, 9, 3)
    assert bool(found)
    np.testing.assert_array_equal(np.asarray(draft), [3, 0, 0])
    # no match
    draft, found = ngram_draft(buf, jnp.asarray(9), 7, 7, 3)
    assert not bool(found)
    # the current context pair itself (at the buffer end) is not a match
    draft, found = ngram_draft(buf, jnp.asarray(9), 9, 3, 3)
    assert not bool(found)


def test_spec_verify_greedy():
    """temperature 0: accept exactly the argmax-matching prefix."""
    v = 16
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, v)), jnp.float32)
    target = np.asarray(jnp.argmax(logits, axis=-1))
    # draft matches positions 0,1 then diverges
    draft = jnp.asarray([target[0], target[1], (target[2] + 1) % v], jnp.int32)
    emitted, n = spec_verify(jax.random.PRNGKey(0), logits, draft, 0.0, 0.9, 99, 98)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(emitted[:3]), target[:3])
    # full acceptance adds the bonus token
    draft = jnp.asarray(target[:3], jnp.int32)
    emitted, n = spec_verify(jax.random.PRNGKey(0), logits, draft, 0.0, 0.9, 99, 98)
    assert int(n) == 4
    np.testing.assert_array_equal(np.asarray(emitted), target)


def test_spec_verify_truncates_at_hand_and_eos():
    v = 16
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, v)), jnp.float32)
    target = np.asarray(jnp.argmax(logits, axis=-1))
    draft = jnp.asarray(target[:3], jnp.int32)
    # pretend position 1's token is the hand token
    emitted, n = spec_verify(
        jax.random.PRNGKey(0), logits, draft, 0.0, 0.9, int(target[1]), 999
    )
    assert int(n) == 2  # hand token emitted, then stop
    emitted, n = spec_verify(
        jax.random.PRNGKey(0), logits, draft, 0.0, 0.9, 999, int(target[0])
    )
    assert int(n) == 1  # eos at the first slot


def test_spec_verify_preserves_distribution():
    """Marginal of the first emitted token == softmax(warped logits),
    whether the draft is likely or unlikely (rejection-sampling identity)."""
    v = 6
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0, 0.5, 1.5]], jnp.float32)
    logits = jnp.concatenate([logits, jnp.zeros((1, v))])  # k=1 -> 2 rows
    temperature, top_p = 0.8, 1.0
    probs = np.asarray(jax.nn.softmax(np.asarray(logits[0]) / temperature))

    @jax.jit
    def one(rng, d):
        emitted, n = spec_verify(rng, logits, jnp.asarray([d]), temperature, top_p, 99, 98)
        return emitted[0]

    n_trials = 20000
    for d in (0, 3):  # high-prob and low-prob drafts
        rngs = jax.random.split(jax.random.PRNGKey(d), n_trials)
        toks = np.asarray(jax.vmap(lambda r: one(r, d))(rngs))
        emp = np.bincount(toks, minlength=v) / n_trials
        # 3-sigma binomial bound per bucket
        for t in range(v):
            sigma = np.sqrt(probs[t] * (1 - probs[t]) / n_trials)
            assert abs(emp[t] - probs[t]) < 4 * sigma + 1e-3, (d, t, emp[t], probs[t])


def _prompt(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    return ids, images


def test_spec_greedy_matches_sequential():
    """Greedy speculative decode is token-identical to the sequential
    device loop, including hand-token counts."""
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    ids, images = _prompt()
    kwargs = dict(max_new_tokens=12, temperature=0.0, attn_impl="xla")
    ref = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(images), jax.random.PRNGKey(7), **kwargs
    )
    out, stats = generate_spec(
        params, CFG, ids, images, jax.random.PRNGKey(7), k=3, chunk_iters=4, **kwargs
    )
    n = int(ref.num_tokens[0])
    assert int(out.num_tokens[0]) == n, (int(out.num_tokens[0]), n)
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, :n]), np.asarray(ref.sequences[0, :n])
    )
    assert int(out.num_hands[0]) == int(ref.num_hands[0])
    assert stats["iters"] >= 1


def test_spec_bank_accelerates():
    """A bank holding the model's own greedy continuation yields drafts that
    accept: fewer forwards than tokens."""
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    ids, images = _prompt()
    kwargs = dict(max_new_tokens=12, temperature=0.0, attn_impl="xla")
    ref = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(images), jax.random.PRNGKey(7), **kwargs
    )
    n = int(ref.num_tokens[0])
    # bank = [last prompt token] + the true continuation (bigram-reachable)
    bank = np.concatenate([[ids[0, -1]], np.asarray(ref.sequences[0, :n])]).astype(np.int32)
    out, stats = generate_spec(
        params, CFG, ids, images, jax.random.PRNGKey(7), k=3, chunk_iters=4,
        bank_ids=bank, **kwargs
    )
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, :n]), np.asarray(ref.sequences[0, :n])
    )
    assert stats["iters"] < stats["tokens"], stats  # >1 token per forward


def test_build_template_bank():
    """Bank tokenization: joins the EK answer templates with EOS and keeps
    only real token ids (no -200 sentinels)."""
    from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
    from handsonvlm_tpu.infer.speculative import build_template_bank

    bank = np.asarray(build_template_bank(MockTokenizer(), CFG, ("reach for the cup",)))
    assert bank.ndim == 1 and bank.size > 20
    assert (bank >= 0).all()
    from handsonvlm_tpu.infer.sampler import EOS_TOKEN_ID

    assert (bank == EOS_TOKEN_ID).sum() >= 7  # one per template joined


def test_gate_falls_back_to_sequential_cost():
    """Acceptance gate: with random weights and no bank (measured-regime
    acceptance ~1.0-1.1 tok/fwd), the probe chunk must flip the loop to
    k=0 — whose per-forward cost IS a sequential step — while the greedy
    output stays token-identical to the sequential loop."""
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    ids, images = _prompt()
    kwargs = dict(max_new_tokens=12, temperature=0.0, attn_impl="xla")
    ref = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(images),
        jax.random.PRNGKey(7), **kwargs
    )
    # threshold above k+1 forces the gate even if a draft lands by luck
    out, stats = generate_spec(
        params, CFG, ids, images, jax.random.PRNGKey(7), k=3, chunk_iters=4,
        gate_tok_per_fwd=99.0, probe_iters=2, **kwargs
    )
    assert stats["gated"] is True
    n = int(ref.num_tokens[0])
    assert int(out.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, :n]), np.asarray(ref.sequences[0, :n])
    )
    # post-gate forwards emit exactly 1 token each: total forwards =
    # probe forwards + remaining tokens
    assert stats["iters"] >= n - 1 - 3 * 2  # probe can emit up to k+1 each

    # gate disabled reproduces the one-dispatch fast path
    out2, stats2 = generate_spec(
        params, CFG, ids, images, jax.random.PRNGKey(7), k=3, chunk_iters=4,
        gate_tok_per_fwd=0.0, **kwargs
    )
    assert stats2["gated"] is False
    np.testing.assert_array_equal(
        np.asarray(out2.sequences[0, :n]), np.asarray(ref.sequences[0, :n])
    )


def test_gate_keeps_speculation_when_accepting():
    """A perfectly matching bank keeps the gate open (no fallback)."""
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    ids, images = _prompt()
    kwargs = dict(max_new_tokens=12, temperature=0.0, attn_impl="xla")
    ref = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(images),
        jax.random.PRNGKey(7), **kwargs
    )
    n = int(ref.num_tokens[0])
    bank = np.concatenate(
        [[ids[0, -1]], np.asarray(ref.sequences[0, :n])]).astype(np.int32)
    out, stats = generate_spec(
        params, CFG, ids, images, jax.random.PRNGKey(7), k=3, chunk_iters=4,
        bank_ids=bank, gate_tok_per_fwd=1.2, probe_iters=2, **kwargs
    )
    assert stats["gated"] is False
    assert stats["iters"] < stats["tokens"]
    np.testing.assert_array_equal(
        np.asarray(out.sequences[0, :n]), np.asarray(ref.sequences[0, :n])
    )
