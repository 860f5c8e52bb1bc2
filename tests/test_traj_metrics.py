"""Metric parity vs the reference's traj_eval module (used as test oracle)."""

import sys

import numpy as np
import pytest

from handsonvlm_tpu.eval.traj_metrics import (
    displacement_per_step,
    evaluate_traj,
    evaluate_traj_stochastic,
    final_displacement,
    weighted_displacement,
)

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PATH)
    try:
        from hoi_forecast.evaluation import traj_eval
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REF_PATH)
    return traj_eval


def _data(seed=0, len_ds=6, s=3):
    rng = np.random.default_rng(seed)
    preds = rng.uniform(-0.1, 1.1, size=(len_ds, s, 2, 4, 2)).astype(np.float32)
    gts = rng.uniform(-0.1, 1.1, size=(len_ds, 2, 4, 2)).astype(np.float32)
    valids = (rng.uniform(size=(len_ds, 2)) > 0.3).astype(np.float32)
    valids[0] = 1  # ensure at least one valid
    return preds, gts, valids


def test_component_metrics_match_reference(ref):
    preds, gts, valids = _data()
    p0 = preds[:, 0]
    for mine, theirs in [
        (displacement_per_step, ref.compute_ade),
        (final_displacement, ref.compute_fde),
        (weighted_displacement, ref.compute_wde),
    ]:
        got, gv = mine(p0, gts, valids, reduction=False)
        want, wv = theirs(p0, gts, valids, reduction=False)
        np.testing.assert_allclose(got, want, atol=1e-6)
        np.testing.assert_allclose(gv, wv)
        got_r, _ = mine(p0, gts, valids, reduction=True)
        want_r, _ = theirs(p0, gts, valids, reduction=True)
        np.testing.assert_allclose(got_r, want_r, atol=1e-6)


def test_evaluate_traj_name_swap(ref):
    preds, gts, valids = _data(1)
    p0 = preds[:, 0]
    got_ade, got_fde = evaluate_traj(p0, gts, valids)
    want_ade, want_fde = ref.evaluate_traj(p0, gts, valids)
    np.testing.assert_allclose(got_ade, want_ade, atol=1e-6)
    np.testing.assert_allclose(got_fde, want_fde, atol=1e-6)
    # and the swap really is a swap: reported ADE == final-step math
    fd, _ = final_displacement(p0, gts, valids)
    assert got_ade == pytest.approx(fd)


def test_stochastic_scorer_matches_reference(ref):
    preds, gts, valids = _data(2)
    got = evaluate_traj_stochastic(preds, gts, valids)
    want = ref.evaluate_traj_stochastic(preds, gts, valids)
    np.testing.assert_allclose(got, want, atol=1e-5)
