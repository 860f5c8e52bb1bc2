"""int4 quality regression under LLaMA-like (non-gaussian) weight stats.

CI-sized version of tools/int4_quality_probe.py (VERDICT #8): round 1 only
oracle-tested int4 on gaussian weights while the bench default served
int4. These tests pin the measured error bounds for heavy-tailed weights
with outlier channels — the documented accept/reject criterion for int4
as the serving default lives in docs/PERF_NOTES.md ("int4 quality bound").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handsonvlm_tpu.core.config import LlamaConfig
from handsonvlm_tpu.models.llama import apply_llama, init_llama, lm_logits
from handsonvlm_tpu.ops.int8_matmul import (
    int4_matmul,
    quantize_int4,
    quantize_int8,
    quantize_llama,
    quantize_llama_int4,
)


def _heavy(rng, shape, std=0.02, df=4.0, out_frac=0.01, out_scale=20.0):
    t = rng.standard_t(df, size=shape) / np.sqrt(df / (df - 2.0))
    w = (t * std).astype(np.float32)
    cols = rng.choice(shape[-1], max(1, int(out_frac * shape[-1])), replace=False)
    w[..., cols] *= out_scale
    return w


def _dequant_int4(q, shape):
    p32 = np.asarray(q["w4"]).astype(np.int32)
    lo = ((p32 & 0x0F) - 8).astype(np.float32)
    hi = (p32 >> 4).astype(np.float32)
    vals = np.concatenate([lo, hi], axis=1)
    return (vals * np.asarray(q["gscale"])[:, None, :]).reshape(shape)


def test_int4_weight_error_bounded_under_outlier_stats():
    rng = np.random.default_rng(0)
    w = _heavy(rng, (512, 512))
    rel4 = np.linalg.norm(_dequant_int4(quantize_int4(jnp.asarray(w)), w.shape) - w) / np.linalg.norm(w)
    w8, s = quantize_int8(jnp.asarray(w))
    rel8 = np.linalg.norm(np.asarray(w8, np.float32) * np.asarray(s) - w) / np.linalg.norm(w)
    # measured 0.19 int4 / 0.027 int8 at 7B shapes (PERF_NOTES); margin for
    # the smaller CI shapes
    assert rel4 < 0.30, rel4
    assert rel8 < 0.05, rel8
    assert rel8 < rel4 / 3


def test_int4_row_outliers_worst_case_bounded():
    rng = np.random.default_rng(1)
    w = _heavy(rng, (512, 512))
    w[rng.choice(512, 5, replace=False), :] *= 20.0
    q = quantize_int4(jnp.asarray(w))
    rel = np.linalg.norm(_dequant_int4(q, w.shape) - w) / np.linalg.norm(w)
    x = rng.normal(size=(4, 512)).astype(np.float32)
    out = np.asarray(int4_matmul(jnp.asarray(x), q["w4"], q["gscale"]))
    mrel = np.linalg.norm(out - x @ w) / np.linalg.norm(x @ w)
    assert rel < 0.32, rel  # measured 0.238 at 7B shapes
    assert mrel < 0.35, mrel


def test_int4_end_to_end_logit_kl_bounded():
    cfg = LlamaConfig(
        vocab_size=32101, hidden_size=128, intermediate_size=256,
        num_layers=3, num_heads=4,
    )
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    for grp in ("attn", "mlp"):
        for name, w in params["layers"][grp].items():
            params["layers"][grp][name] = jnp.asarray(
                np.stack([_heavy(rng, w.shape[1:]) for _ in range(cfg.num_layers)])
            )

    def logits(p):
        ids = jnp.asarray(np.random.default_rng(7).integers(3, 30000, size=(1, 24)))
        h, _ = apply_llama(p, cfg, input_ids=ids, attn_impl="xla")
        return np.asarray(lm_logits(p, cfg, h), np.float64)[0]

    lr = logits(params)
    p4 = quantize_llama_int4(dict(params))
    p8 = quantize_llama(dict(params))

    def kl(lq):
        pr = np.exp(lr - lr.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        qv = np.exp(lq - lq.max(-1, keepdims=True))
        qv /= qv.sum(-1, keepdims=True)
        return float((pr * (np.log(pr + 1e-12) - np.log(qv + 1e-12))).sum(-1).mean())

    kl4, kl8 = kl(logits(p4)), kl(logits(p8))
    # measured 0.0053 / 0.00007 at d=256 L=4 (PERF_NOTES); generous margins
    assert kl4 < 0.05, kl4
    assert kl8 < 0.005, kl8
    assert kl8 < kl4
