"""Pooling / splice / hand-embedding behavior vs reference semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.models.pooling import pool_video_tokens
from handsonvlm_tpu.models.handsonvlm import (
    add_hand_coord_embeddings,
    extract_hand_embeddings,
    splice_visual_tokens,
    traj_positional_embedding,
)

torch = pytest.importorskip("torch")


def test_temporal_spatial_pool_matches_torch_avgpool():
    """Mirror of lita_arch.py:54-70 built from torch ops."""
    rng = np.random.default_rng(0)
    b, t, s, d = 2, 10, 256, 16
    tokens = rng.normal(size=(b, t, s, d)).astype(np.float32)

    # reference computation
    tt = torch.tensor(tokens)
    sel = np.round(np.linspace(0, t - 1, 4)).astype(int)
    st = tt[:, sel]  # (b,4,256,d)
    st = st.reshape(b * 4, 16, 16, d).permute(0, 3, 1, 2)
    st = torch.nn.functional.avg_pool2d(st, kernel_size=2)
    st = st.permute(0, 2, 3, 1).reshape(b, 4 * 64, d)
    t_tok = tt.mean(dim=2)
    ref = torch.cat([t_tok, st], dim=1).numpy()

    got = np.asarray(pool_video_tokens(jnp.asarray(tokens), "temporal_spatial_pool"))
    assert got.shape == (b, t + 256, d)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pool_modes_shapes():
    x = jnp.zeros((2, 8, 256, 4))
    assert pool_video_tokens(x, "all").shape == (2, 8 * 256, 4)
    assert pool_video_tokens(x, "temporal").shape == (2, 8, 4)
    assert pool_video_tokens(x, "spatial").shape == (2, 256, 4)
    assert pool_video_tokens(x, "temporal_spatial").shape == (2, 264, 4)
    assert pool_video_tokens(x, "temporal_spatial_pool").shape == (2, 264, 4)
    assert pool_video_tokens(x, "spatial_pool").shape == (2, 256, 4)


def _reference_splice(ids, text_emb, vis, labels, attn):
    """Per-sample python splice following handsonvlm.py:232-414."""
    t = ids.shape[0]
    n = vis.shape[0]
    if (ids == IMAGE_TOKEN_INDEX).sum() == 0:
        return text_emb, labels, attn
    p = int(np.where(ids == IMAGE_TOKEN_INDEX)[0][0])
    emb = np.concatenate([text_emb[:p], vis, text_emb[p + 1 :]], axis=0)
    lab = np.concatenate(
        [labels[:p], np.full(n, IGNORE_INDEX, labels.dtype), labels[p + 1 :]]
    )
    att = np.concatenate([attn[:p], np.ones(n, bool), attn[p + 1 :]])
    return emb, lab, att


def test_splice_matches_reference_loop():
    rng = np.random.default_rng(1)
    b, t, n, d = 3, 9, 5, 8
    ids = rng.integers(3, 50, size=(b, t))
    ids[0, 2] = IMAGE_TOKEN_INDEX
    ids[1, 0] = IMAGE_TOKEN_INDEX
    ids[2, t - 1] = IMAGE_TOKEN_INDEX
    text_emb = rng.normal(size=(b, t, d)).astype(np.float32)
    vis = rng.normal(size=(b, n, d)).astype(np.float32)
    labels = rng.integers(3, 50, size=(b, t))
    attn = np.ones((b, t), bool)
    attn[1, -2:] = False

    sp = splice_visual_tokens(
        jnp.asarray(text_emb),
        jnp.asarray(ids),
        jnp.asarray(vis),
        attn_mask=jnp.asarray(attn),
        labels=jnp.asarray(labels),
    )
    assert sp.embeds.shape == (b, t + n - 1, d)
    for i in range(b):
        e, l, a = _reference_splice(ids[i], text_emb[i], vis[i], labels[i], attn[i])
        np.testing.assert_allclose(np.asarray(sp.embeds)[i], e, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sp.labels)[i], l)
        np.testing.assert_array_equal(np.asarray(sp.attn_mask)[i], a)


def test_splice_no_image_sample():
    b, t, n, d = 1, 6, 4, 8
    ids = np.full((b, t), 7)
    text_emb = np.ones((b, t, d), np.float32)
    vis = np.full((b, n, d), 5.0, np.float32)
    labels = np.full((b, t), 9)
    sp = splice_visual_tokens(
        jnp.asarray(text_emb), jnp.asarray(ids), jnp.asarray(vis),
        labels=jnp.asarray(labels),
    )
    out = np.asarray(sp.embeds)[0]
    np.testing.assert_allclose(out[:t], 1.0)
    np.testing.assert_allclose(out[t:], 0.0)  # tail is padding, not visual
    assert not np.asarray(sp.attn_mask)[0, t:].any()
    assert (np.asarray(sp.labels)[0, t:] == IGNORE_INDEX).all()


def _reference_traj_pos_embed(gt_hand, token_dim):
    """process_traj_positional_embedding (handsonvlm.py:310-338) in torch."""
    gt_hand = torch.tensor(gt_hand, dtype=torch.float32)
    channels = token_dim // 4
    num_hands = gt_hand.shape[1]
    flat = gt_hand.reshape(-1, 2)
    x, y = flat[:, 0], flat[:, 1]
    inv_freq = 1.0 / (10000 ** (torch.arange(0, channels, 2).float() / channels))
    x_enc = x.unsqueeze(-1) * inv_freq
    y_enc = y.unsqueeze(-1) * inv_freq
    enc = torch.cat([x_enc.sin(), y_enc.cos(), x_enc.sin(), y_enc.cos()], dim=-1)
    emb = enc.reshape(2, num_hands, token_dim // 2).permute(1, 2, 0)
    return emb.reshape(num_hands, token_dim).numpy()


def test_traj_positional_embedding_parity():
    rng = np.random.default_rng(2)
    for n in (1, 4):
        gt = rng.uniform(size=(2, n, 2)).astype(np.float32)
        ref = _reference_traj_pos_embed(gt, 64)
        got = np.asarray(traj_positional_embedding(jnp.asarray(gt), 64))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_add_hand_coord_embeddings_scatter():
    d = 16
    t = 10
    ids = np.full((1, t), 5)
    ids[0, [3, 5, 6, 8]] = HAND_TOKEN_ID
    text = np.zeros((1, t, d), np.float32)
    hands = np.random.default_rng(3).uniform(size=(1, 2, 4, 2)).astype(np.float32)
    out = np.asarray(
        add_hand_coord_embeddings(
            jnp.asarray(text), jnp.asarray(ids), jnp.asarray(hands), scale_by_count=True
        )
    )[0]
    ref = _reference_traj_pos_embed(hands[0], d)  # cnt==4 -> scale 1
    for k, p in enumerate([3, 5, 6, 8]):
        np.testing.assert_allclose(out[p], ref[k], atol=1e-6)
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[9], 0.0)


def test_extract_hand_embeddings():
    b, t, d = 2, 8, 8
    labels = np.full((b, t), IGNORE_INDEX)
    labels[0, [2, 4, 5, 7]] = HAND_TOKEN_ID  # sample 0: 4 hand tokens
    hidden = np.arange(b * t * d, dtype=np.float32).reshape(b, t, d)
    fv = np.ones((b, 2), np.float32)
    emb, fv2 = extract_hand_embeddings(
        jnp.asarray(hidden), jnp.asarray(labels), jnp.asarray(fv)
    )
    emb = np.asarray(emb)
    assert emb.shape == (b, 2, 4, d // 2)
    # hand label at position 2 -> hidden at position 1
    h = hidden[0, 1].reshape(d // 2, 2)
    np.testing.assert_allclose(emb[0, 0, 0], h[:, 0])
    np.testing.assert_allclose(emb[0, 1, 0], h[:, 1])
    # sample 1 has no hand tokens -> zeros + invalidated
    np.testing.assert_allclose(emb[1], 0.0)
    np.testing.assert_allclose(np.asarray(fv2)[1], 0.0)
    np.testing.assert_allclose(np.asarray(fv2)[0], 1.0)
