"""Tokenization/masking parity vs the reference preprocess code (oracle)."""

import sys
import types

import numpy as np
import pytest

from handsonvlm_tpu.constants import (
    HAND_TOKEN_ID,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from handsonvlm_tpu.data.conversation import conv_templates
from handsonvlm_tpu.data.mock_tokenizer import MockTokenizer
from handsonvlm_tpu.data.tokenization import (
    build_conversation_prompt,
    preprocess_multimodal,
    preprocess_v1,
    tokenizer_image_token,
)

REF = "/root/reference"


def _stub_module(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _fake_pkg(name, path):
    """Register a package whose __init__ is NOT executed (the reference's
    __init__ chains pull in MPT code incompatible with transformers 4.57)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference llava/lita preprocessing modules as test oracles."""
    if "decord" not in sys.modules:
        _stub_module("decord", VideoReader=object, cpu=lambda *a: None)
    _fake_pkg("llava", REF + "/llava")
    _fake_pkg("lita", REF + "/lita")
    _fake_pkg("lita.dataset", REF + "/lita/dataset")
    _fake_pkg("handsonvlm", REF + "/handsonvlm")
    try:
        import llava.conversation as ref_conv
        import llava.mm_utils as ref_mm
        import lita.dataset.base_dataset as ref_base
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    ref_conv.default_conversation = ref_conv.conv_templates["v1"]
    return ref_conv, ref_mm, ref_base


SOURCE = [
    {"from": "human", "value": "<image>\nWhere should my hand move to if I want to open the fridge?"},
    {"from": "gpt", "value": "The hand trajectory for this action is as follows: <hand_traj><hand_traj><hand_traj><hand_traj>."},
]

MULTITURN = [
    {"from": "human", "value": "<image>\nWhat is the predicted action in this video?"},
    {"from": "gpt", "value": "The predicted action in this video is open fridge."},
    {"from": "human", "value": "What is the recommended hand trajectory for doing this?"},
    {"from": "gpt", "value": "The possible following hand trajectory may be: <hand_traj><hand_traj><hand_traj><hand_traj>."},
]


def test_prompt_rendering_matches_reference(ref_modules):
    ref_conv, _, _ = ref_modules
    for source in (SOURCE, MULTITURN):
        conv = ref_conv.conv_templates["v1"].copy()
        conv.messages = []
        roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
        for s in source:
            conv.append_message(roles[s["from"]], s["value"])
        want = conv.get_prompt()
        got = build_conversation_prompt(source, conv_templates["v1"])
        assert got == want


def test_tokenizer_image_token_matches_reference(ref_modules):
    _, ref_mm, _ = ref_modules
    tok = MockTokenizer()
    prompt = build_conversation_prompt(SOURCE, conv_templates["v1"])
    want = ref_mm.tokenizer_image_token(prompt, tok)
    got = tokenizer_image_token(prompt, tok)
    assert got == want
    assert got.count(IMAGE_TOKEN_INDEX) == 1
    assert got.count(HAND_TOKEN_ID) == 4


def test_preprocess_v1_masks_match_reference(ref_modules):
    _, _, ref_base = ref_modules
    tok = MockTokenizer()
    import copy

    for source in (SOURCE, MULTITURN):
        sources = preprocess_multimodal(copy.deepcopy([source]))
        want = ref_base.preprocess_v1(copy.deepcopy(sources), tok, has_image=True)
        got = preprocess_v1(copy.deepcopy(sources), tok, has_image=True)
        np.testing.assert_array_equal(got["input_ids"], want["input_ids"].numpy())
        np.testing.assert_array_equal(got["labels"], want["labels"].numpy())


def test_mask_structure():
    tok = MockTokenizer()
    import copy

    sources = preprocess_multimodal(copy.deepcopy([SOURCE]))
    out = preprocess_v1(sources, tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    # hand tokens supervised
    assert (labels == HAND_TOKEN_ID).sum() == 4
    # image sentinel + everything before the answer is masked
    img_pos = int(np.where(ids == IMAGE_TOKEN_INDEX)[0][0])
    assert (labels[: img_pos + 1] == IGNORE_INDEX).all()
    # answer tokens supervised and equal to input ids there
    sup = labels != IGNORE_INDEX
    assert sup.sum() > 4
    np.testing.assert_array_equal(ids[sup], labels[sup])
