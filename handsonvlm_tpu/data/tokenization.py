"""Tokenization: image-token splicing, SFT label masking, tokenizer setup.

Torch-free re-implementation of the reference's tokenization contract:
- `tokenizer_image_token` (llava/mm_utils.py:20-77): split on `<image>`,
  insert the -200 sentinel, drop duplicated BOS of later chunks.
- `preprocess_v1` (lita/dataset/base_dataset.py:183-255): vicuna-v1 prompt
  rendering + IGNORE_INDEX masking of system/human turns using the same
  split-on-sep2 / instruction_len-2 arithmetic (the arithmetic is part of
  the data contract — checkpoints were trained with these exact masks).
- tokenizer surgery (handsonvlm/model/builder.py:113-152,
  lita/model/lita_arch.py:88-94, handsonvlm_arch.py:19-25): 100 time tokens
  then `<hand_traj>` = 32100.

Any tokenizer with `encode(text) -> List[int]` (BOS included), plus
bos/eos/pad ids and `model_max_length`, works — the real path wraps the HF
Vicuna sentencepiece tokenizer; tests use the deterministic mock.
"""

from __future__ import annotations

from typing import Dict, List, Protocol, Sequence

import numpy as np

from handsonvlm_tpu.constants import (
    DEFAULT_IMAGE_TOKEN,
    HAND_TOKEN_TEMPLATE,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    NUM_TIME_TOKENS,
    TIME_TOKEN_TEMPLATE,
)
from handsonvlm_tpu.data.conversation import Conversation, SeparatorStyle, conv_templates


class Tokenizer(Protocol):
    bos_token_id: int
    eos_token_id: int
    pad_token_id: int
    model_max_length: int

    def encode(self, text: str) -> List[int]:
        """Tokenize with BOS prepended (sentencepiece convention)."""
        ...


def tokenizer_image_token(
    prompt: str, tokenizer: Tokenizer, image_token_index: int = IMAGE_TOKEN_INDEX
) -> List[int]:
    """Split the prompt on <image> and insert the sentinel id."""
    chunks = [tokenizer.encode(c) for c in prompt.split(DEFAULT_IMAGE_TOKEN)]

    def insert_separator(xs, sep):
        out = []
        for i, x in enumerate(xs):
            out.append(x)
            if i != len(xs) - 1:
                out.append(sep)
        return out

    input_ids: List[int] = []
    offset = 0
    if chunks and chunks[0] and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        input_ids.append(chunks[0][0])
    for x in insert_separator(chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def build_conversation_prompt(
    source: Sequence[Dict[str, str]], conv: Conversation
) -> str:
    """Render a [{'from': 'human'|'gpt', 'value': ...}] source to a prompt."""
    conv = conv.copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    if roles[source[0]["from"]] != conv.roles[0]:
        source = source[1:]
    conv.messages = []
    for j, sentence in enumerate(source):
        role = roles[sentence["from"]]
        assert role == conv.roles[j % 2], "conversation roles must alternate"
        conv.append_message(role, sentence["value"])
    return conv.get_prompt()


def preprocess_multimodal(sources):
    """Move <image> to its own leading line (epic_dataset.py:19-32)."""
    for source in sources:
        for sentence in source:
            if DEFAULT_IMAGE_TOKEN in sentence["value"]:
                v = sentence["value"].replace(DEFAULT_IMAGE_TOKEN, "").strip()
                sentence["value"] = (DEFAULT_IMAGE_TOKEN + "\n" + v).strip()
    return sources


def preprocess_v1(
    sources: Sequence[Sequence[Dict[str, str]]],
    tokenizer: Tokenizer,
    has_image: bool = False,
    conv: Conversation = None,
) -> Dict[str, np.ndarray]:
    """Vicuna-v1 SFT tokenization + label masking.

    Returns dict(input_ids (B,T) int64 right-padded with pad_token_id,
    labels (B,T) with IGNORE_INDEX over system/human/pad positions).
    """
    conv = conv or conv_templates["v1"]
    assert conv.sep_style == SeparatorStyle.TWO

    conversations = [build_conversation_prompt(s, conv) for s in sources]

    if has_image:
        ids_list = [tokenizer_image_token(p, tokenizer) for p in conversations]
    else:
        ids_list = [tokenizer.encode(p)[: tokenizer.model_max_length] for p in conversations]

    max_len = max(len(x) for x in ids_list)
    b = len(ids_list)
    input_ids = np.full((b, max_len), tokenizer.pad_token_id, np.int64)
    for i, ids in enumerate(ids_list):
        input_ids[i, : len(ids)] = ids
    targets = input_ids.copy()

    sep = conv.sep + conv.roles[1] + ": "
    for conversation, target, ids in zip(conversations, targets, ids_list):
        total_len = len(ids)

        rounds = conversation.split(conv.sep2)
        cur_len = 1
        target[:cur_len] = IGNORE_INDEX
        for rou in rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            if has_image:
                round_len = len(tokenizer_image_token(rou, tokenizer))
                instruction_len = len(tokenizer_image_token(parts[0], tokenizer)) - 2
            else:
                round_len = len(tokenizer.encode(rou))
                instruction_len = len(tokenizer.encode(parts[0])) - 2
            target[cur_len : cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX

        if cur_len < tokenizer.model_max_length and cur_len != total_len:
            target[:] = IGNORE_INDEX  # tokenization mismatch -> drop sample

    return {"input_ids": input_ids, "labels": targets}


def preprocess_plain(
    sources: Sequence[Sequence[Dict[str, str]]], tokenizer: Tokenizer
) -> Dict[str, np.ndarray]:
    """Projector-pretraining format (base_dataset.py:321-337): prompt is the
    bare <image> token; everything before the caption is masked."""
    ids_list, label_list = [], []
    for source in sources:
        assert len(source) == 2
        assert DEFAULT_IMAGE_TOKEN in source[0]["value"]
        prompt = DEFAULT_IMAGE_TOKEN + source[1]["value"] + "\n"
        ids = tokenizer_image_token(prompt, tokenizer)
        labels = list(ids)
        masked = len(tokenizer_image_token(DEFAULT_IMAGE_TOKEN, tokenizer))
        labels[:masked] = [IGNORE_INDEX] * masked
        ids_list.append(ids)
        label_list.append(labels)
    max_len = max(len(x) for x in ids_list)
    input_ids = np.full((len(ids_list), max_len), tokenizer.pad_token_id, np.int64)
    labels = np.full((len(ids_list), max_len), IGNORE_INDEX, np.int64)
    for i, (ids, lab) in enumerate(zip(ids_list, label_list)):
        input_ids[i, : len(ids)] = ids
        labels[i, : len(lab)] = lab
    return {"input_ids": input_ids, "labels": labels}


def preprocess_llama_2(
    sources: Sequence[Sequence[Dict[str, str]]],
    tokenizer: Tokenizer,
    has_image: bool = False,
) -> Dict[str, np.ndarray]:
    """LLAMA_2 [INST] format (base_dataset.py:183-255 llama_2 variant):
    same split/offset arithmetic with sep '[/INST] ' and sep2 '</s>'."""
    conv = conv_templates["llama_2"]
    conversations = [build_conversation_prompt(s, conv) for s in sources]
    if has_image:
        ids_list = [tokenizer_image_token(p, tokenizer) for p in conversations]
    else:
        ids_list = [tokenizer.encode(p)[: tokenizer.model_max_length] for p in conversations]
    max_len = max(len(x) for x in ids_list)
    b = len(ids_list)
    input_ids = np.full((b, max_len), tokenizer.pad_token_id, np.int64)
    for i, ids in enumerate(ids_list):
        input_ids[i, : len(ids)] = ids
    targets = input_ids.copy()

    sep = "[/INST] "
    for conversation, target, ids in zip(conversations, targets, ids_list):
        total_len = len(ids)
        rounds = conversation.split(conv.sep2)
        cur_len = 1
        target[:cur_len] = IGNORE_INDEX
        for rou in rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            if has_image:
                round_len = len(tokenizer_image_token(rou, tokenizer))
                instruction_len = len(tokenizer_image_token(parts[0], tokenizer)) - 2
            else:
                round_len = len(tokenizer.encode(rou))
                instruction_len = len(tokenizer.encode(parts[0])) - 2
            target[cur_len : cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX
        if cur_len < tokenizer.model_max_length and cur_len != total_len:
            target[:] = IGNORE_INDEX
    return {"input_ids": input_ids, "labels": targets}


def preprocess(
    sources, tokenizer: Tokenizer, has_image: bool = False, conv: Conversation = None
) -> Dict[str, np.ndarray]:
    """Dispatch on the conversation style (base_dataset.py:340-355)."""
    conv = conv or conv_templates["v1"]
    if conv.sep_style == SeparatorStyle.PLAIN:
        return preprocess_plain(sources, tokenizer)
    if conv.sep_style == SeparatorStyle.LLAMA_2:
        return preprocess_llama_2(sources, tokenizer, has_image)
    if conv.version.startswith("v1"):
        return preprocess_v1(sources, tokenizer, has_image, conv)
    raise NotImplementedError(f"unsupported conversation style {conv.version}")


# ---------------------------------------------------------------------------
# HF tokenizer wrapper (the real path; requires a local Vicuna tokenizer)
# ---------------------------------------------------------------------------


class HFTokenizer:
    """Wraps a transformers LlamaTokenizer with the HandsOnVLM vocab surgery."""

    def __init__(self, path: str, model_max_length: int = 2048):
        import transformers

        try:
            # the reference loads the slow sentencepiece tokenizer
            # (builder.py:89 use_fast=False); environments without the
            # sentencepiece package (this repo's CI) fall back to the fast
            # tokenizer, which produces identical ids from the same vocab
            self.tok = transformers.AutoTokenizer.from_pretrained(
                path, use_fast=False
            )
        except Exception as e:
            # scope the fallback to the documented missing-sentencepiece
            # case; anything else (bad path, corrupt files) should surface
            if not isinstance(e, (ImportError, ModuleNotFoundError)) and \
                    "sentencepiece" not in str(e).lower():
                raise
            import logging

            logging.getLogger(__name__).warning(
                "slow tokenizer load failed (%s); falling back to use_fast=True", e
            )
            self.tok = transformers.AutoTokenizer.from_pretrained(
                path, use_fast=True
            )
        self.tok.model_max_length = model_max_length
        self.model_max_length = model_max_length
        # tokenizer surgery, replaying builder.py:113-152
        time_tokens = [TIME_TOKEN_TEMPLATE.format(t=x) for x in range(NUM_TIME_TOKENS)]
        self.tok.add_tokens(time_tokens)
        self.tok.add_tokens([HAND_TOKEN_TEMPLATE])
        self.time_token_ids = self.tok.convert_tokens_to_ids(time_tokens)
        self.hand_token_id = self.tok.convert_tokens_to_ids(HAND_TOKEN_TEMPLATE)
        self.bos_token_id = self.tok.bos_token_id
        self.eos_token_id = self.tok.eos_token_id
        self.pad_token_id = (
            self.tok.pad_token_id if self.tok.pad_token_id is not None else self.tok.unk_token_id
        )

    def __len__(self):
        return len(self.tok)

    def add_pixel_tokens(self, n_bins: int) -> List[int]:
        """<bin_1>..<bin_n> tokens (handsonvlm_arch.py:27-31; unused by the
        default recipe but part of the tokenizer surface)."""
        bin_tokens = [f"<bin_{i}>" for i in range(1, n_bins + 1)]
        self.tok.add_tokens(bin_tokens)
        return self.tok.convert_tokens_to_ids(bin_tokens)

    def encode(self, text: str) -> List[int]:
        return self.tok(text).input_ids

    def decode(self, ids) -> str:
        return self.tok.decode(ids)
