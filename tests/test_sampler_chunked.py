"""Chunked decode must match the host loop (and hence the device loop)."""

import numpy as np
import pytest
import jax

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.infer.sampler import generate_chunked, generate_host

CFG = tiny_config()


@pytest.mark.parametrize("chunk", [1, 4, 7])
def test_chunked_matches_host(chunk):
    params = init_handsonvlm(jax.random.PRNGKey(42), CFG)
    rng_np = np.random.default_rng(0)
    ids = rng_np.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng_np.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)

    kwargs = dict(max_new_tokens=10, temperature=0.0, attn_impl="xla")
    host = generate_host(params, CFG, ids, images, jax.random.PRNGKey(7), **kwargs)
    chk = generate_chunked(params, CFG, ids, images, jax.random.PRNGKey(7), chunk=chunk, **kwargs)

    n = int(host.num_tokens[0])
    assert int(chk.num_tokens[0]) == n
    np.testing.assert_array_equal(
        np.asarray(host.sequences[0, :n]), np.asarray(chk.sequences[0, :n])
    )
    assert int(chk.num_hands[0]) == int(host.num_hands[0])
    np.testing.assert_allclose(
        np.asarray(chk.pred_hands), np.asarray(host.pred_hands), atol=1e-5
    )
