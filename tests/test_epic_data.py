"""EPIC data pipeline on synthetic fixtures (no real EK data needed)."""

import numpy as np
import pandas as pd
import pytest

from handsonvlm_tpu.constants import HAND_TOKEN_ID, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.data import epic_constants as C
from handsonvlm_tpu.data.action_sampler import sample_history_frames
from handsonvlm_tpu.data.epic_dataset import (
    EpicConversationDataset,
    EpicMultiturnConversationDataset,
    tile_frames_to_100,
)
from handsonvlm_tpu.data.epic_structures import EpicHOIDataset, actions_from_df
from handsonvlm_tpu.data.epic_utils import process_video_info, sample_hand_trajectory
from handsonvlm_tpu.data.hybrid_dataset import Collator, HybridDataset
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer


def _fake_df(n=6):
    rows = []
    for i in range(n):
        start = 200.0 + 10 * i  # seconds
        rows.append(
            dict(
                uid=1000 + i,
                participant_id="P01",
                video_id="P01_01",
                verb="open",
                verb_class=2,
                noun="fridge",
                noun_class=5,
                all_nouns=["fridge"],
                all_noun_classes=[5],
                start_frame=int(start * 60) + 1,
                stop_frame=int((start + 2) * 60),
                start_time=start,
                stop_time=start + 2.0,
                action="open_fridge",
                action_class=7,
                narration="open the fridge",
            )
        )
    # one invalid action (starts before the anticipation window)
    rows.append(dict(rows[0], uid=999, start_time=0.5, start_frame=31))
    return pd.DataFrame(rows)


class FakeLmdb(dict):
    def __contains__(self, key):
        return True

    def __getitem__(self, key):
        rng = np.random.default_rng(abs(hash(key)) % 2**31)
        g = rng.normal(size=(1024,)).astype(np.float32)
        return {
            "GLOBAL_FEAT": g,
            "HAND_RIGHT_FEAT": g * 0.5,
            "HAND_RIGHT_BBOX": np.asarray([0.1, 0.1, 0.3, 0.3]),
            # left hand absent -> defaults kick in
            "OBJECT_RIGHT_FEAT": g * 0.2,
            "OBJECT_RIGHT_BBOX": np.asarray([0.2, 0.2, 0.4, 0.4]),
        }


def _labels(df):
    out = {}
    for uid in df.uid:
        traj = np.cumsum(np.ones((21, 2), np.float32) * 5, axis=0) + 100
        video_info = {
            "frame_indices": [123],
            "hand_trajs": {"RIGHT": {"traj": traj}},
            "affordance": {"select_points_homo": np.asarray([[228.0, 128.0]])},
        }
        fh, cp, fv, _ = process_video_info(video_info, np.random.default_rng(0))
        out[int(uid)] = {
            "future_hands": fh,
            "contact_point": cp,
            "future_valid": fv,
        }
    return out


@pytest.fixture
def hoi_dataset():
    df = _fake_df()
    return EpicHOIDataset(
        df, "train", "ek100", load_images=False,
        lmdb_env=FakeLmdb(), labels=_labels(df),
    )


def test_action_sampler_window():
    times, idxs = sample_history_frames(60 * 60 + 1)  # action at t=60s
    assert len(idxs) == 10
    # last observed frame is 1s before the action start
    assert abs(times[-1] - 59.0) < 1 / 60
    # 4 fps spacing = 15 source frames
    assert np.all(np.diff(idxs) == 15)


def test_sample_hand_trajectory_normalization():
    traj = np.stack([np.linspace(0, 456, 21), np.linspace(0, 256, 21)], axis=1)
    pts, indices = sample_hand_trajectory(traj.astype(np.float32))
    assert pts.shape == (5, 2)
    assert indices == [0, 5, 10, 15, 20]
    np.testing.assert_allclose(pts[-1], [1.0, 1.0])


def test_validity_filter():
    actions, invalid = actions_from_df(_fake_df(), "train")
    assert len(invalid) == 1 and invalid[0].uid == 999


def test_hoi_dataset_shapes(hoi_dataset):
    d, action = hoi_dataset[0]
    assert d["feat"].shape == (5, 10, 1024)
    assert d["bbox_feat"].shape == (4, 10, 4)
    assert d["valid_mask"].shape == (5, 10)
    assert d["future_hands"].shape == (2, 5, 2)
    assert d["future_valid"].tolist() == [1, 0]  # left hand absent
    # absent left hand gets the (0.25, 1.5) default trajectory
    np.testing.assert_allclose(d["future_hands"][1, 0], [0.25, 1.5])
    assert d["narration"] == "open the fridge"
    # left-hand valid_mask rows are zero (bbox absent)
    assert d["valid_mask"][2].sum() == 0


def test_conversation_dataset_and_collator(hoi_dataset):
    tok = MockTokenizer()
    ds = EpicConversationDataset(tok, hoi_dataset, deterministic=True)
    item = ds[0]
    ids = np.asarray(item["input_ids"])
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert (ids == HAND_TOKEN_ID).sum() == 4
    labels = np.asarray(item["labels"])
    assert (labels == HAND_TOKEN_ID).sum() == 4
    assert item["image"].shape == (100, 3, 224, 224)

    batch = Collator(pad_token_id=tok.pad_token_id)([ds[0], ds[1]])
    assert batch["input_ids"].shape == batch["labels"].shape
    assert batch["input_ids"].shape[1] % 64 == 0
    assert batch["image"].shape == (2, 100, 3, 224, 224)
    assert batch["future_hands"].shape == (2, 2, 5, 2)
    assert batch["attn_mask"].dtype == bool


def test_multiturn_modes(hoi_dataset):
    tok = MockTokenizer()
    ds = EpicMultiturnConversationDataset(tok, hoi_dataset)
    for _ in range(8):
        item = ds[0]
        n_hand = (np.asarray(item["input_ids"]) == HAND_TOKEN_ID).sum()
        assert n_hand in (0, 4)  # some modes have no trajectory turn


def test_hybrid_mixture(hoi_dataset):
    tok = MockTokenizer()
    ds1 = EpicConversationDataset(tok, hoi_dataset)
    hybrid = HybridDataset(
        task_datasets=[[ds1]], task_sample_rate=[1.0], samples_per_epoch=17
    )
    assert len(hybrid) == 17
    item = hybrid[0]
    assert "input_ids" in item


def test_tile_frames():
    x = np.arange(10)[:, None, None, None] * np.ones((10, 3, 2, 2))
    out = tile_frames_to_100(x)
    assert out.shape == (100, 3, 2, 2)
    np.testing.assert_allclose(out[:10, 0, 0, 0], np.arange(10))
    np.testing.assert_allclose(out[10:20, 0, 0, 0], np.arange(10))
