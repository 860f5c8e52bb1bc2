"""Left-padded prompts must be logit-exact vs unpadded (rotary is relative)."""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.infer.sampler import generate_chunked

CFG = tiny_config()


def test_left_padding_exact():
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 11))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    kwargs = dict(max_new_tokens=8, temperature=0.0, attn_impl="xla", chunk=4)
    base = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)

    pad = np.zeros((1, 5), np.int64)
    ids_padded = np.concatenate([pad, ids], axis=1)
    attn = np.concatenate([np.zeros((1, 5), bool), np.ones((1, 11), bool)], axis=1)
    padded = generate_chunked(
        params, CFG, ids_padded, images, jax.random.PRNGKey(7),
        attn_mask=attn, **kwargs,
    )

    n = int(base.num_tokens[0])
    assert int(padded.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(base.sequences[0, :n]), np.asarray(padded.sequences[0, :n])
    )
    np.testing.assert_allclose(
        np.asarray(base.pred_hands), np.asarray(padded.pred_hands), atol=1e-4
    )
