"""TP/FSDP-sharded cached decode on the simulated 8-device mesh.

The serving story for 13B+ on a pod slice: params sharded over
('data','model'), generate_chunked jitted as-is — GSPMD propagates the
shardings through prefill, the KV cache, and the decode loop. Greedy
output must match the unsharded single-device decode bit-for-bit.

(Pallas decode kernels are a single-device construct — on the CPU mesh
attention dispatch picks the XLA path; real multi-chip TP would wrap the
kernels in shard_map, a ROADMAP item.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.core.config import tiny_config
from handsonvlm_tpu.infer.sampler import generate_chunked
from handsonvlm_tpu.models.handsonvlm import init_handsonvlm
from handsonvlm_tpu.parallel.mesh import create_mesh
from handsonvlm_tpu.parallel.partition import shard_params

CFG = tiny_config()


def _prompt(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 1000, size=(1, 12))
    ids[0, 1] = IMAGE_TOKEN_INDEX
    images = rng.normal(
        size=(1, CFG.num_frames, 3, CFG.vision.image_size, CFG.vision.image_size)
    ).astype(np.float32)
    return ids, images


def _decode(params, ids, images):
    out = generate_chunked(
        params, CFG, jnp.asarray(ids), jnp.asarray(images),
        jax.random.PRNGKey(3), max_new_tokens=8, temperature=0.0,
        attn_impl="xla", chunk=4,
    )
    n = int(out.num_tokens[0])
    return np.asarray(out.sequences[0, :n]), int(out.num_hands[0])


def test_tp_sharded_decode_matches_unsharded():
    params = init_handsonvlm(jax.random.PRNGKey(0), CFG)
    ids, images = _prompt()
    ref_seq, ref_hands = _decode(params, ids, images)

    for axes in ({"data": 4, "model": 2}, {"data": 8, "model": 1}):
        mesh = create_mesh(**axes)
        sharded = shard_params(params, mesh)
        seq, hands = _decode(sharded, ids, images)
        np.testing.assert_array_equal(seq, ref_seq), axes
        assert hands == ref_hands
