"""Host-driven decode must match the fused device loop exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.infer.sampler import generate, generate_host

CFG = tiny_config()


def test_host_loop_matches_device_loop():
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    kwargs = dict(max_new_tokens=10, temperature=0.0, attn_impl="xla")
    dev = generate(params, CFG, jnp.asarray(ids), jnp.asarray(images), jax.random.PRNGKey(7), **kwargs)
    host = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)

    n = int(dev.num_tokens[0])
    assert int(host.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(dev.sequences[0, :n]), np.asarray(host.sequences[0, :n])
    )
    assert int(host.num_hands[0]) == int(dev.num_hands[0])
    np.testing.assert_allclose(
        np.asarray(host.pred_hands), np.asarray(dev.pred_hands), atol=1e-5
    )


def test_keyword_stopping():
    """stop_strs truncates a row as soon as the decoded tail contains the
    keyword (reference KeywordsStoppingCriteria, llava/mm_utils.py:192-215):
    with a keyword the run finishes no later than without, and stops right
    after the first token whose decode contains the keyword."""
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    class DecodeTok:
        def decode(self, ids_):
            return " ".join(f"<{int(i)}>" for i in np.atleast_1d(ids_))

    kwargs = dict(max_new_tokens=10, temperature=0.0, attn_impl="xla")
    base = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)
    n = int(base.num_tokens[0])
    assert n >= 3
    # keyword = decode of the 3rd generated token -> stop after 3 tokens
    kw = f"<{int(base.sequences[0, 2])}>"
    stopped = generate_host(
        params, CFG, ids, images, jax.random.PRNGKey(7),
        stop_strs=[kw], tokenizer=DecodeTok(), **kwargs,
    )
    m = int(stopped.num_tokens[0])
    assert m <= 3, (m, n)
    np.testing.assert_array_equal(
        np.asarray(stopped.sequences[0, :m]), np.asarray(base.sequences[0, :m])
    )
