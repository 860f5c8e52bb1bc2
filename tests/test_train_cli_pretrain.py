"""Projector-pretraining recipe end-to-end through the trainer CLI.

The reference's first-stage recipe (llava/train/train.py:38-928,
LazySupervisedDataset over image-text pairs + --tune_mm_mlp_adapter):
--tasks pretrain trains on LLaVA-Pretrain caption pairs with the plain
template and saves the projector-only adapter artifact (the
mm_projector.bin equivalent). This drives train.main() on a disk fixture.
"""

import json
import sys

import numpy as np
import pytest


@pytest.fixture()
def pretrain_fixture(tmp_path):
    from PIL import Image

    d = tmp_path / "LLaVA-Pretrain"
    (d / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.uniform(0, 255, size=(240, 320, 3)).astype(np.uint8)
        ).save(d / "images" / name)
        records.append({
            "image": name,
            "conversations": [
                {"from": "human", "value": "<image>"},
                {"from": "gpt", "value": f"a synthetic caption number {i}"},
            ],
        })
    (d / "blip_laion_cc_sbu_558k.json").write_text(json.dumps(records))
    return tmp_path


def test_pretrain_cli_saves_projector_adapter(pretrain_fixture, tmp_path, monkeypatch):
    from handsonvlm_tpu.train import train

    out = tmp_path / "run"
    argv = [
        "train", "--model-path", "random:tiny224", "--preset", "tiny224",
        "--tasks", "pretrain", "--data-path", str(pretrain_fixture),
        "--tune-mm-mlp-adapter", "--output-dir", str(out),
        "--num-frames", "4", "--batch-size", "8", "--samples-per-epoch", "8",
        "--epochs", "1", "--max-steps", "1", "--log-every", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train.main()

    from handsonvlm_tpu.core.checkpoint import has_artifact, restore_artifact

    assert has_artifact(str(out), "mm_projector")
    proj = restore_artifact(str(out), "mm_projector")
    assert "kernel" in proj or any(
        "kernel" in str(k) for k in proj
    )  # projector params saved
    metrics = (out / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 1
    last = json.loads(metrics[-1])
    assert np.isfinite(last["loss"])
