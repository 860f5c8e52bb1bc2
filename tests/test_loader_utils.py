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
