"""LITA task datasets on synthetic JSON fixtures."""

import json
import os

import numpy as np
import pytest

from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
from handsonvlm_tpu.data.lita_datasets import (
    DVCDataset_activitynet,
    EventLocDataset_activitynet,
    TemporalReasoningDataset_activitynet,
    VidQADataset_msvdqa,
    convert_timestamps_to_time_tokens,
    timestamp_to_time_token,
)
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer


def test_timestamp_quantization():
    assert timestamp_to_time_token(0.0, 100.0) == "<t0>"
    assert timestamp_to_time_token(100.0, 100.0) == "<t99>"
    assert timestamp_to_time_token(50.0, 100.0) == "<t50>"  # round(99*0.5)=50


def test_timestamp_regex_conversion():
    s = "It happens between <12.5> and <20> in the video <0.>"
    out = convert_timestamps_to_time_tokens(s, duration=100.0)
    assert out == "It happens between <t12> and <t20> in the video <t0>"


@pytest.fixture
def anet_fixture(tmp_path):
    frames_dir = tmp_path / "activitynet-captions" / "activitynet_frames" / "v_001"
    frames_dir.mkdir(parents=True)
    from PIL import Image

    for i in range(4):
        Image.new("RGB", (64, 48), (i * 10, 0, 0)).save(frames_dir / f"f{i:04d}.jpg")
    train = {
        "v_001": {
            "duration": 60.0,
            "timestamps": [[0.0, 10.0], [30.0, 60.0]],
            "sentences": ["A person opens a fridge.", "They cook a meal."],
        }
    }
    (tmp_path / "activitynet-captions" / "train.json").write_text(json.dumps(train))
    tr_dir = tmp_path / "temporal_reasoning"
    tr_dir.mkdir()
    tr = {
        "v_001": {
            "duration": 60.0,
            "QA": [{"q": "When does cooking happen?", "a": "Between <30> and <60.> they cook."}],
        }
    }
    (tr_dir / "activitynet_train_gpt-4-0613_temp_6_f10009.json").write_text(json.dumps(tr))
    return str(tmp_path)


def test_dvc_dataset(anet_fixture):
    ds = DVCDataset_activitynet(anet_fixture, MockTokenizer(), load_images=True)
    assert len(ds) == 1
    item = ds[0]
    ids = np.asarray(item["input_ids"])
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # answer contains quantized time tokens: 0s->t0, 10s->round(99/6)=17 etc.
    assert 32000 in ids  # <t0>
    assert item["image"].shape[0] == ds.num_frames


def test_event_loc_dataset(anet_fixture):
    ds = EventLocDataset_activitynet(anet_fixture, MockTokenizer(), load_images=False)
    item = ds[0]
    ids = np.asarray(item["input_ids"])
    labels = np.asarray(item["labels"])
    sup = labels[labels != -100]
    # answer is exactly two time tokens (+ eos)
    time_toks = [t for t in sup if 32000 <= t <= 32099]
    assert len(time_toks) == 2


def test_temporal_reasoning_dataset(anet_fixture):
    ds = TemporalReasoningDataset_activitynet(anet_fixture, MockTokenizer(), load_images=False)
    assert len(ds) == 1
    item = ds[0]
    ids = list(np.asarray(item["input_ids"]))
    # <30> of 60s -> t = round(99*0.5) = 50 -> token 32050
    assert 32050 in ids
    assert 32099 in ids  # <60.> -> t99


def test_vidqa_dataset(tmp_path):
    d = tmp_path / "msvdqa"
    d.mkdir()
    (d / "train_qa.json").write_text(
        json.dumps([
            {"video": "vid1.avi", "QA": [{"q": "what is shown", "a": "a cat"}]}
        ])
    )
    (d / "YouTubeClips").mkdir()
    ds = VidQADataset_msvdqa(str(tmp_path), MockTokenizer(), load_images=False)
    item = ds[0]
    ids = np.asarray(item["input_ids"])
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    labels = np.asarray(item["labels"])
    assert (labels != -100).sum() > 0


def test_llava_pretrain_dataset(tmp_path):
    import json as _json

    from handsonvlm_tpu.data.lita_datasets import LlavaPretrainDataset

    d = tmp_path / "LLaVA-Pretrain"
    d.mkdir()
    (d / "blip_laion_cc_sbu_558k.json").write_text(
        _json.dumps([
            {
                "image": "x.jpg",
                "conversations": [
                    {"from": "human", "value": "<image>"},
                    {"from": "gpt", "value": "a kitchen with a fridge"},
                ],
            }
        ])
    )
    ds = LlavaPretrainDataset(str(tmp_path), MockTokenizer(), load_images=False)
    item = ds[0]
    ids = np.asarray(item["input_ids"])
    labels = np.asarray(item["labels"])
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    img_pos = int(np.where(ids == IMAGE_TOKEN_INDEX)[0][0])
    assert (labels[: img_pos + 1] == -100).all()
    assert (labels[img_pos + 1 :] != -100).any()
