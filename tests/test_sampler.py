"""KV-cached sampler vs the reference's cache-less decode protocol.

The oracle below re-runs the *full* prefix every step with decoded-so-far
waypoints embedded at hand-token positions — exactly the reference's
`sample()` loop (handsonvlm.py:478-672, use_cache=False). The cached sampler
must produce identical tokens and waypoints (greedy decoding + mirrored RNG
splits) because only the last position's hidden state is ever consumed.
"""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import (
    add_hand_coord_embeddings,
    decode_hand_waypoint,
    encode_video,
    init_handsonvlm,
    splice_visual_tokens,
)
from handsonvlm_tpu.models.llama import apply_llama, lm_logits
from handsonvlm_tpu.infer.sampler import (
    EOS_TOKEN_ID,
    clip_pred_hands,
    generate,
    _warp_logits,
)

CFG = tiny_config()


def _oracle_decode(params, cfg, input_ids, images, rng, max_new_tokens):
    """Reference protocol: full-prefix recompute per step, no cache."""
    b = input_ids.shape[0]
    assert b == 1
    embed_table = params["llama"]["embed"]["weight"]
    visual = encode_video(params, cfg, images, attn_impl="xla")

    gen_tokens = []
    waypoints = []  # list of (B,2,2)
    cur_waypoints = {}  # map: index into gen_tokens -> waypoint at that token

    for step in range(max_new_tokens):
        rng, r_step = jax.random.split(rng)
        r_tok, r_hand = jax.random.split(r_step)

        ids = np.concatenate(
            [np.asarray(input_ids)[0], np.asarray(gen_tokens, np.int64)]
        )[None, :]
        ids_j = jnp.asarray(ids)
        safe = jnp.where(ids_j < 0, 0, ids_j)
        text_embeds = embed_table[safe]
        if waypoints:
            fh = jnp.stack(waypoints, axis=2)  # (B,2,n,2)
            text_embeds = add_hand_coord_embeddings(
                text_embeds, ids_j, fh, scale_by_count=False
            )
        sp = splice_visual_tokens(text_embeds, ids_j, visual)
        hidden, _ = apply_llama(
            params["llama"], cfg.llama, inputs_embeds=sp.embeds,
            attn_mask=sp.attn_mask, attn_impl="xla",
        )
        last = hidden[:, -1, :]
        logits = lm_logits(params["llama"], cfg.llama, last[:, None, :])[:, 0]
        token = int(jnp.argmax(logits, axis=-1)[0])  # greedy
        wp = decode_hand_waypoint(params, cfg, last, r_hand)
        if token == HAND_TOKEN_ID:
            waypoints.append(wp)
        gen_tokens.append(token)
        if token == EOS_TOKEN_ID:
            break
    return gen_tokens, waypoints


def _prompt(t=12):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(1, t))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images)


def test_cached_matches_reference_protocol():
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    ids, images = _prompt()
    rng = jax.random.PRNGKey(7)
    max_new = 12

    ref_tokens, ref_wps = _oracle_decode(params, CFG, ids, images, rng, max_new)
    out = generate(
        params, CFG, ids, images, rng,
        max_new_tokens=max_new, temperature=0.0, attn_impl="xla",
    )
    n = int(out.num_tokens[0])
    got_tokens = list(np.asarray(out.sequences[0, :n]))
    assert got_tokens == ref_tokens[:n]
    assert len(ref_tokens) == n or (len(ref_tokens) == max_new and n == max_new)
    nh = int(out.num_hands[0])
    assert nh == len(ref_wps)
    for k in range(nh):
        np.testing.assert_allclose(
            np.asarray(out.pred_hands[0, :, k, :]),
            np.asarray(ref_wps[k][0]),
            atol=1e-4,
        )


def test_sampled_decode_runs_and_is_reproducible():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    ids, images = _prompt()
    out1 = generate(params, CFG, ids, images, jax.random.PRNGKey(3),
                    max_new_tokens=8, temperature=0.5, top_p=0.9, attn_impl="xla")
    out2 = generate(params, CFG, ids, images, jax.random.PRNGKey(3),
                    max_new_tokens=8, temperature=0.5, top_p=0.9, attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(out1.sequences), np.asarray(out2.sequences))


def test_top_p_warper_matches_hf():
    import torch
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper,
        TopPLogitsWarper,
    )

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(2, 50)).astype(np.float32) * 3
    temp, top_p = 0.5, 0.9
    t = TemperatureLogitsWarper(temp)(None, torch.tensor(logits))
    ref = TopPLogitsWarper(top_p)(None, t).numpy()
    got = np.asarray(_warp_logits(jnp.asarray(logits), temp, top_p))
    # compare resulting probability distributions (inf masks equal)
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    np.testing.assert_allclose(
        np.where(np.isinf(got), 0, got), np.where(np.isinf(ref), 0, ref), atol=1e-5
    )


def test_clip_pred_hands():
    # reference semantics: short -> zero-pad; long -> keep last 4
    pred = np.zeros((1, 2, 10, 2), np.float32)
    for k in range(6):
        pred[0, :, k] = k + 1.0
    out, valid = clip_pred_hands(pred, np.array([2]), num_steps=4)
    assert out.shape == (1, 2, 4, 2) and valid[0]
    np.testing.assert_allclose(out[0, 0, :, 0], [1, 2, 0, 0])
    out6, _ = clip_pred_hands(pred, np.array([6]), num_steps=4)
    np.testing.assert_allclose(out6[0, 0, :, 0], [3, 4, 5, 6])
    out0, valid0 = clip_pred_hands(pred, np.array([0]), num_steps=4)
    np.testing.assert_allclose(out0, 0.0)
    assert not valid0[0]
