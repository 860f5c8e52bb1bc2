"""Native C++ frame loader: builds, decodes, matches the PIL pipeline."""

import numpy as np
import pytest

from handsonvlm_tpu.data.native_loader import (
    load_frames,
    load_frames_native,
    native_available,
)
from handsonvlm_tpu.data.video_io import load_image

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture
def jpegs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(320, 240), (240, 320), (224, 224)]):
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_matches_pil(jpegs):
    out, ok = load_frames_native(jpegs, size=224, num_threads=2)
    assert ok.all()
    assert out.shape == (3, 3, 224, 224)
    for i, p in enumerate(jpegs):
        ref = load_image(p, cache_dir=None)
        # bicubic implementations differ slightly; compare in normalized
        # space with a loose-but-meaningful tolerance
        diff = np.abs(out[i] - ref)
        assert diff.mean() < 0.03, (i, diff.mean())
        assert np.quantile(diff, 0.99) < 0.25, (i, np.quantile(diff, 0.99))


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_native_handles_missing_file(tmp_path, jpegs):
    paths = jpegs + [str(tmp_path / "missing.jpg")]
    out, ok = load_frames_native(paths, size=224)
    assert ok[:3].all() and not ok[3]
    np.testing.assert_allclose(out[3], 0.0)


def test_load_frames_fallback(jpegs):
    out = load_frames(jpegs, size=224)
    assert out.shape == (3, 3, 224, 224)
    assert np.isfinite(out).all()
