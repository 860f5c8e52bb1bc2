"""Interpret-mode coverage for the (gated-off) fused MLP decode kernel.

The kernel measured SLOWER than the unfused path on-chip and is disabled
by default (docs/PERF_NOTES.md "Fused MLP-half megakernel"); these tests
keep the recorded experiment importable and numerically honest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handsonvlm_tpu.ops.fused_decode import fused_mlp_ok, fused_mlp_stacked
from handsonvlm_tpu.ops.int8_matmul import int4_matmul_stacked, tile_int4_stacked

L, D, F, BN = 2, 256, 512, 128


def _leaf(key, din, dout, bn):
    g = din // 128
    w = jax.random.randint(key, (L, g, 64, dout), -128, 128, jnp.int32).astype(jnp.int8)
    s = jnp.abs(jax.random.normal(key, (L, g, dout))) * 0.01 + 0.005
    return tile_int4_stacked(w, s.astype(jnp.float32), block_n=bn)


@pytest.fixture(scope="module")
def tree():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "wg": _leaf(ks[0], D, F, BN),
        "wu": _leaf(ks[1], D, F, BN),
        "w_down": _leaf(ks[2], F, D, BN),
        "x": jax.random.normal(ks[3], (1, D)).astype(jnp.bfloat16),
        "nrm": jnp.ones((L, D), jnp.bfloat16),
    }


def test_fused_mlp_matches_unfused_path(tree):
    wg, wu, wd = tree["wg"], tree["wu"], tree["w_down"]
    nrm, x = tree["nrm"], tree["x"]
    out = fused_mlp_stacked(x, nrm, wg, wu, wd, 1)

    hf = x.astype(jnp.float32)
    ms = jnp.mean(hf * hf, axis=-1, keepdims=True)
    xn = (hf * jax.lax.rsqrt(ms + 1e-6) * nrm[1].astype(jnp.float32)).astype(x.dtype)
    g = int4_matmul_stacked(xn, wg["w4t"], wg["gst"], 1)
    u = int4_matmul_stacked(xn, wu["w4t"], wu["gst"], 1)
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    dn = int4_matmul_stacked(act, wd["w4t"], wd["gst"], 1)
    ref = (x.astype(jnp.float32) + dn.astype(jnp.float32)).astype(x.dtype)

    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    # fused dequantizes to bf16 before the dot; unfused uses int8 algebra —
    # a few % relative difference is the expected numerics gap, not a bug
    # (same magnitude as the on-chip probe: 3.0e-2).
    assert rel < 0.1, rel


def test_fused_mlp_gated_off_by_default(tree, monkeypatch):
    monkeypatch.delenv("HANDSONVLM_FUSED_MLP", raising=False)
    assert not fused_mlp_ok(tree, D, 1, 1)
    monkeypatch.setenv("HANDSONVLM_FUSED_MLP", "1")
    assert fused_mlp_ok(tree, D, 1, 1)
    assert not fused_mlp_ok(tree, D, 2, 1)  # prefill-shaped: never
