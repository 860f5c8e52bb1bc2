"""RTL eval utilities + plain/llama_2 preprocess variants."""

import numpy as np
import pytest

from handsonvlm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.data.tokenization import (
    preprocess,
    preprocess_llama_2,
    preprocess_plain,
)
from handsonvlm_tpu.data.conversation import conv_templates
from handsonvlm_tpu.eval.rtl import (
    decode_time_tokens,
    iou,
    parse_start_end_timestamps,
    score_rtl,
    time_token_to_seconds,
)


def test_parse_timestamps():
    text, seg = parse_start_end_timestamps(
        "The event happens <12.5> to <30.0> in the clip.", duration=60.0
    )
    assert seg == [12.5, 30.0]
    assert "<12.5>" not in text
    # clamping + ordering
    _, seg2 = parse_start_end_timestamps("<999> then <5.>", duration=50.0)
    assert seg2 == [5.0, 50.0]
    # fewer than two -> whole video
    _, seg3 = parse_start_end_timestamps("no timestamps here", duration=42.0)
    assert seg3 == [0.0, 42.0]


def test_iou_and_scores():
    assert iou([0, 10], [5, 15]) == pytest.approx(5 / 15)
    assert iou([0, 1], [2, 3]) == 0.0
    scores = score_rtl(
        [
            {"pred": [0, 10], "gt": [0, 10]},
            {"pred": [0, 1], "gt": [5, 6]},
        ]
    )
    assert scores["iou"] == pytest.approx(0.5)
    assert scores["precision@0.5"] == pytest.approx(0.5)


def test_decode_time_tokens_roundtrip():
    time_ids = list(range(32000, 32100))
    # dataset quantization: t=50s of 100s -> index round(99*0.5)=50
    rest, secs = decode_time_tokens([5, 32050, 7], duration=100.0, time_token_ids=time_ids)
    assert rest == [5, 7]
    assert secs[0] == pytest.approx(time_token_to_seconds(50, 100.0))
    assert abs(secs[0] - 50.0) < 1.0


def test_preprocess_plain():
    tok = MockTokenizer()
    sources = [[
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "a photo of a kitchen"},
    ]]
    out = preprocess_plain(sources, tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    img_pos = int(np.where(ids == IMAGE_TOKEN_INDEX)[0][0])
    assert (labels[: img_pos + 1] == IGNORE_INDEX).all()
    assert (labels[img_pos + 1 :] != IGNORE_INDEX).any()


def test_preprocess_llama_2_masks():
    tok = MockTokenizer()
    sources = [[
        {"from": "human", "value": "<image>\nwhat is in the video?"},
        {"from": "gpt", "value": "a hand opening a fridge"},
    ]]
    out = preprocess_llama_2(sources, tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    sup = labels != IGNORE_INDEX
    assert sup.any()
    np.testing.assert_array_equal(ids[sup], labels[sup])


def test_preprocess_dispatch():
    tok = MockTokenizer()
    sources = [[
        {"from": "human", "value": "<image>\nquestion?"},
        {"from": "gpt", "value": "answer."},
    ]]
    v1 = preprocess(sources, tok, has_image=True)
    l2 = preprocess(sources, tok, has_image=True, conv=conv_templates["llama_2"])
    assert v1["input_ids"].shape != l2["input_ids"].shape or not np.array_equal(
        v1["input_ids"], l2["input_ids"]
    )
