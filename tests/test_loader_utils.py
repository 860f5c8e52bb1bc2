"""PrefetchLoader, meters, profiling helpers, logging."""

import logging
import time

import numpy as np
import jax

from handsonvlm_tpu.train.loader import PrefetchLoader
from handsonvlm_tpu.utils.logging import build_logger
from handsonvlm_tpu.utils.meters import AverageMeters
from handsonvlm_tpu.utils.profiling import StepTimer


class TinyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((4,), i, np.float32), "prompt": f"p{i}"}


def _collate(samples):
    return {
        "x": np.stack([s["x"] for s in samples]),
        "prompt": [s["prompt"] for s in samples],
    }


def test_prefetch_loader_shapes_and_count():
    loader = PrefetchLoader(
        TinyDataset(), _collate, batch_size=4, num_steps=5, num_workers=2, seed=0
    )
    batches = list(loader)
    assert len(batches) == 5
    for b in batches:
        assert b["x"].shape == (4, 4)
        assert "prompt" not in b  # dropped (non-array key)


def test_prefetch_loader_deterministic_seed():
    a = [b["x"] for b in PrefetchLoader(TinyDataset(), _collate, 4, 3, seed=7)]
    b = [b["x"] for b in PrefetchLoader(TinyDataset(), _collate, 4, 3, seed=7)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_prefetch_loader_device_put():
    import jax.numpy as jnp

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    loader = PrefetchLoader(
        TinyDataset(), _collate, 2, 2, sharding=sharding, seed=0
    )
    for b in loader:
        assert isinstance(b["x"], jax.Array)


def test_prefetch_loader_per_host_slices():
    """Pod semantics: hosts draw the same global stream and take disjoint
    interleaved slices that reassemble to the full global batch."""
    host_batches = []
    for pi in range(4):
        loader = PrefetchLoader(
            TinyDataset(), _collate, batch_size=8, num_steps=3, seed=11,
            process_index=pi, process_count=4,
        )
        host_batches.append(list(loader))
    for step in range(3):
        xs = [host_batches[pi][step]["x"] for pi in range(4)]
        assert all(x.shape == (2, 4) for x in xs)  # 8 global / 4 hosts
        # interleaved reassembly matches a single-host draw of the same seed
        merged = np.empty((8, 4), np.float32)
        for pi in range(4):
            merged[pi::4] = xs[pi]
        ref = np.random.default_rng(11)
        for _ in range(step + 1):
            idxs = ref.integers(0, 10, size=8)
        np.testing.assert_array_equal(merged[:, 0], idxs.astype(np.float32))


def test_prefetch_loader_global_batch_divisibility():
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        PrefetchLoader(TinyDataset(), _collate, 6, 1, process_index=0, process_count=4)


def test_prefetch_loader_make_global_array():
    """Single-process path through make_array_from_process_local_data over
    the 8-device mesh (the multi-host assembly API, degenerate case)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from handsonvlm_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=8, model=1)
    sharding = NamedSharding(mesh, P("data"))
    loader = PrefetchLoader(TinyDataset(), _collate, 8, 2, sharding=sharding, seed=0)
    loader.process_count = 1  # jax.process_count() in tests
    for b in loader:
        assert isinstance(b["x"], jax.Array)
        assert b["x"].shape == (8, 4)
        assert b["x"].sharding.spec == P("data")


def test_average_meters():
    m = AverageMeters()
    m.add_loss_value("loss", 1.0)
    m.add_loss_value("loss", 3.0)
    assert m.average()["loss"] == 2.0
    assert m["loss"].count == 2


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.steady_steps == 2
    assert 0.005 < t.sec_per_step < 0.1
    s = t.summary()
    assert s["steps"] == 3


def test_build_logger(tmp_path):
    log_file = tmp_path / "x.log"
    lg = build_logger("hvlm-test", str(log_file))
    lg.info("hello world")
    for h in lg.handlers:
        h.flush()
    assert "hello world" in log_file.read_text()
    # idempotent: no duplicate handlers
    lg2 = build_logger("hvlm-test", str(log_file))
    assert lg2 is lg
    n_file = sum(isinstance(h, logging.FileHandler) for h in lg.handlers)
    assert n_file == 1


def test_distributed_single_process():
    from handsonvlm_tpu.parallel.distributed import (
        gather_metrics,
        initialize,
        is_main_process,
    )

    initialize()  # no-op single process
    assert is_main_process()
    out = gather_metrics({"a": np.ones((2, 3)), "b": [np.zeros(4)]})
    assert out["a"].shape == (2, 3)


def test_frame_cache_eviction(tmp_path, monkeypatch):
    """The /dev/shm frame cache stays under budget by evicting oldest files."""
    from PIL import Image

    from handsonvlm_tpu.data import video_io

    # three ~600KB entries under a ~1.2MB budget -> the oldest must go
    monkeypatch.setattr(video_io, "CACHE_MAX_BYTES", 1_300_000)
    video_io._cache_usage["bytes"] = -1
    video_io._cache_usage["checked"] = 0.0
    cache = str(tmp_path / "cache")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (256, 456, 3), np.uint8)).save(p)
        paths.append(p)
    for i, p in enumerate(paths):
        out = video_io.load_image(p, cache_dir=cache)
        assert out.shape == (3, 224, 224)
        video_io._cache_usage["checked"] = 0.0  # force re-scan next call
        time.sleep(0.02)  # distinct mtimes for eviction order
    files = list((tmp_path / "cache").iterdir())
    total = sum(f.stat().st_size for f in files)
    assert total <= 1_300_000
    assert len(files) < 3  # something was evicted
    # cached reload still works for a surviving entry
    out2 = video_io.load_image(paths[-1], cache_dir=cache)
    np.testing.assert_array_equal(out2, video_io.load_image(paths[-1], cache_dir=None))
