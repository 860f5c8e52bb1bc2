"""Ring attention (sequence-parallel) vs full XLA attention on the
simulated 8-device CPU mesh. The reference has no sequence parallelism at
all (SURVEY.md §5: context capped at 2048, long video handled by token
compression) — this is a beyond-reference capability, so the oracle is
this repo's own attention_xla."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from handsonvlm_tpu.ops.attention import attention_xla
from handsonvlm_tpu.parallel.ring_attention import ring_attention


def _mesh(n, name="seq"):
    devs = np.array(jax.devices()[:n]).reshape(n)
    return Mesh(devs, (name,))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("p", [2, 4, 8])
def test_ring_matches_full(causal, p):
    mesh = _mesh(p)
    b, t, h, d = 2, 8 * p, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)

    ref = attention_xla(q, k, v, causal=causal)

    sh = NamedSharding(mesh, P(None, "seq", None, None))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(
        lambda a, b_, c: ring_attention(a, b_, c, mesh=mesh, causal=causal)
    )(qs, ks_, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_differentiable():
    mesh = _mesh(4)
    b, t, h, d = 1, 16, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=True) ** 2)

    g = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_ring_rejects_indivisible():
    mesh = _mesh(4)
    x = jnp.zeros((1, 10, 2, 8))
    with pytest.raises(ValueError):
        ring_attention(x, x, x, mesh=mesh)


def test_seq_parallel_train_step_matches():
    """make_train_step(seq_mesh=...) — the full SFT step with ring attention
    over a ('data','seq') mesh matches the unsharded step's loss/grad-norm.
    Sequence length is padded to a multiple of the seq axis by the caller;
    non-divisible T falls back to regular attention (guard in _layer)."""
    import optax

    from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
    from handsonvlm_tpu.train.step import make_train_step
    from handsonvlm_tpu.train.train_state import TrainState

    cfg = tiny_config()
    params = init_handsonvlm(jax.random.PRNGKey(0), cfg)
    rng_np = np.random.default_rng(0)
    b = 2
    # splice output length = T_text + num_visual_tokens - 1; pick T_text so
    # the spliced length divides the 4-wide seq axis
    t_text = 13
    t_spliced = t_text + cfg.num_visual_tokens - 1
    pad = (-t_spliced) % 4
    t_text += pad
    ids = rng_np.integers(3, 1000, size=(b, t_text))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "attn_mask": jnp.ones((b, t_text), bool),
        "image": jnp.asarray(rng_np.normal(size=(
            b, cfg.num_frames, 3, cfg.vision.image_size, cfg.vision.image_size
        )).astype(np.float32)),
        "labels": jnp.asarray(ids),
        "future_hands": jnp.asarray(
            rng_np.uniform(size=(b, 2, 5, 2)).astype(np.float32)),
        "future_valid": jnp.ones((b, 2), jnp.int32),
    }
    tx = optax.sgd(1e-3)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))

    # the jitted step donates the state: give each run its own buffers
    def fresh_state():
        p = init_handsonvlm(jax.random.PRNGKey(0), cfg)
        return TrainState(step=jnp.asarray(0), params=p, opt_state=tx.init(p))

    _, m_ref = make_train_step(cfg, tx, attn_impl="xla")(
        fresh_state(), batch, jax.random.PRNGKey(3))

    state1 = fresh_state()
    _, m_sp = make_train_step(cfg, tx, attn_impl="xla", seq_mesh=mesh)(
        state1, batch, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_sp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=2e-3)


def test_collator_seq_multiple_padding():
    """Collator pads text length so text + splice_extra divides seq_multiple
    (the condition for ring attention to engage in --seq-parallel runs)."""
    from handsonvlm_tpu.data.hybrid_dataset import Collator

    coll = Collator(pad_token_id=0, model_max_length=2048, num_frames=4,
                    seq_multiple=4, splice_extra=355)
    inst = {
        "input_ids": np.arange(3, 50, dtype=np.int64),
        "labels": np.arange(3, 50, dtype=np.int64),
        "image": np.zeros((4, 3, 8, 8), np.float32),
    }
    batch = coll([dict(inst)])
    t_text = batch["input_ids"].shape[1]
    assert (t_text + 355) % 4 == 0, t_text


def test_ring_gqa():
    """kv_heads < num_heads (GQA): KV rides the ring unrepeated; output
    matches attention_xla's repeated-KV reference."""
    mesh = _mesh(4)
    b, t, h, kh, d = 2, 16, 8, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, kh, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, kh, d), jnp.float32)
    ref = attention_xla(q, k, v, causal=True)
    out = ring_attention(q, k, v, mesh=mesh, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_shard_params_on_seq_mesh():
    """shard_params rules mention the 'model' axis; on a ('data','seq')
    mesh those dims must fall back to replicated instead of KeyError
    (the --seq-parallel CLI startup path)."""
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
    from handsonvlm_tpu.parallel.mesh import create_mesh
    from handsonvlm_tpu.parallel.partition import shard_params

    mesh = create_mesh(seq=4)
    assert mesh.axis_names == ("data", "seq")
    params = init_handsonvlm(jax.random.PRNGKey(0), tiny_config())
    sharded = shard_params(params, mesh)  # must not raise
    leaf = jax.tree_util.tree_leaves(sharded)[0]
    assert leaf.sharding.mesh.axis_names == ("data", "seq")


def test_rope_extrapolates_beyond_2048():
    """Long-context mechanism check: RoPE here is computed directly from
    positions (models/llama.py:rope_cos_sin, no 2048-row table like HF's
    cached sin/cos), so positions past the reference's
    max_position_embeddings produce the exact analytic angles."""
    from handsonvlm_tpu.models.llama import apply_rope, rope_cos_sin

    hd, theta = 16, 10000.0
    pos = jnp.asarray([[0, 2047, 2048, 4095, 8191]], jnp.int32)
    cos, sin = rope_cos_sin(pos, hd, theta)
    inv = 1.0 / theta ** (np.arange(0, hd, 2) / hd)
    ang = np.asarray(pos, np.float64)[..., None] * inv  # (1,5,hd/2)
    want_cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
    want_sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
    # fp32 trig at ~8k-radian angles carries ~5e-5 absolute error (same as
    # HF's fp32 rotary tables) — tolerance reflects that, not a logic gap
    np.testing.assert_allclose(np.asarray(cos), want_cos, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sin), want_sin, atol=2e-4)

    # rotation preserves norms and relative-position structure at T>2048:
    # q.k depends only on the position DELTA
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, hd))
    qr = apply_rope(q, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(qr), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)
    # pairs (2047,2048) and (4095,4096) have the same delta=1 dot product
    pos2 = jnp.asarray([[2047, 2048, 4095, 4096]], jnp.int32)
    cos2, sin2 = rope_cos_sin(pos2, hd, theta)
    x = jnp.tile(jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, hd)), (1, 4, 1, 1))
    xr = apply_rope(x, cos2, sin2)
    d01 = float(jnp.sum(xr[0, 0, 0] * xr[0, 1, 0]))
    d23 = float(jnp.sum(xr[0, 2, 0] * xr[0, 3, 0]))
    np.testing.assert_allclose(d01, d23, rtol=1e-4)


def test_seq_parallel_train_step_t4096():
    """The long-context recipe end-to-end at T=4096 (2x the reference's
    hard cap): full SFT train step with 8-way ring attention over the
    ('data','seq') mesh at a spliced length of 4096, parity vs the
    unsharded step. Pairs with train.py --max-len 4096 --seq-parallel 8."""
    import dataclasses

    import optax

    from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
    from handsonvlm_tpu.core.config import tiny_config
    from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
    from handsonvlm_tpu.train.step import make_train_step
    from handsonvlm_tpu.train.train_state import TrainState

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, max_length=4096,
        llama=dataclasses.replace(cfg.llama, max_position_embeddings=4096))
    t_spliced = 4096
    t_text = t_spliced - (cfg.num_visual_tokens - 1)
    rng_np = np.random.default_rng(0)
    b = 1
    ids = rng_np.integers(3, 1000, size=(b, t_text))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attn_mask": jnp.ones((b, t_text), bool),
        "image": jnp.asarray(rng_np.normal(size=(
            b, cfg.num_frames, 3, cfg.vision.image_size, cfg.vision.image_size
        )).astype(np.float32)),
        "labels": jnp.asarray(labels),
        "future_hands": jnp.asarray(
            rng_np.uniform(size=(b, 2, 5, 2)).astype(np.float32)),
        "future_valid": jnp.ones((b, 2), jnp.int32),
    }
    tx = optax.sgd(1e-3)

    def fresh_state():
        p = init_handsonvlm(jax.random.PRNGKey(0), cfg)
        return TrainState(step=jnp.asarray(0), params=p, opt_state=tx.init(p))

    _, m_ref = make_train_step(cfg, tx, attn_impl="xla")(
        fresh_state(), batch, jax.random.PRNGKey(3))

    devs = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("data", "seq"))
    _, m_sp = make_train_step(cfg, tx, attn_impl="xla", seq_mesh=mesh)(
        fresh_state(), batch, jax.random.PRNGKey(3))

    assert np.isfinite(float(m_sp["loss"]))
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_sp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=2e-3)
