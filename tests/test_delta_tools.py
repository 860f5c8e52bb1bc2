"""Weight-delta tools: make/apply roundtrip, corner rule, passthrough."""

import numpy as np
import jax

from handsonvlm_tpu.convert.delta import apply_delta, make_delta


def _tree(embed_rows, seed):
    rng = np.random.default_rng(seed)
    return {
        "llama": {
            "embed": {"weight": rng.normal(size=(embed_rows, 8)).astype(np.float32)},
            "layers": {"wq": rng.normal(size=(2, 8, 8)).astype(np.float32)},
        },
        "projector": {"w": rng.normal(size=(4, 8)).astype(np.float32)},
    }


def test_roundtrip_with_resized_vocab_and_passthrough():
    base = _tree(10, 0)
    del base["projector"]  # projector absent from base (make_delta.py:25-27)
    target = _tree(13, 1)  # tokenizer surgery added 3 embed rows

    delta = make_delta(target, base)
    # rows beyond the base vocab ride along at full value
    np.testing.assert_array_equal(
        delta["llama"]["embed"]["weight"][10:], target["llama"]["embed"]["weight"][10:]
    )
    # overlapping rows are true deltas
    np.testing.assert_allclose(
        delta["llama"]["embed"]["weight"][:10],
        target["llama"]["embed"]["weight"][:10] - base["llama"]["embed"]["weight"],
        rtol=1e-6,
    )
    # leaves missing from base pass through untouched
    np.testing.assert_array_equal(delta["projector"]["w"], target["projector"]["w"])

    restored = apply_delta(delta, base)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), restored, target
    )


def test_bf16_leaves_keep_dtype():
    import jax.numpy as jnp

    base = {"w": jnp.ones((4, 4), jnp.bfloat16)}
    target = {"w": jnp.full((4, 4), 3.0, jnp.bfloat16)}
    delta = make_delta(target, base)
    assert np.asarray(delta["w"]).dtype == jnp.bfloat16
    restored = apply_delta(delta, base)
    np.testing.assert_array_equal(np.asarray(restored["w"], np.float32), 3.0)
