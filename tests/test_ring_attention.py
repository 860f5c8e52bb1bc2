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
