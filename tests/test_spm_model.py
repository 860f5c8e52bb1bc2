"""Pure-python sentencepiece loader (data/spm_model.py): protobuf parse,
unigram Viterbi, spm-BPE merges, byte fallback, decode, and the HFTokenizer
surgery replay on a hand-built 32000-piece model.

Fixtures are written with a minimal protobuf wire-format writer below (no
sentencepiece / protobuf dependency anywhere). The Viterbi segmenter is
cross-checked against TWO independent oracles: a brute-force best-path
search and the HF `tokenizers` Unigram lattice.
"""

import struct

import numpy as np
import pytest

from handsonvlm_tpu.data.spm_model import (
    BPE,
    BYTE,
    CONTROL,
    NORMAL,
    UNIGRAM,
    UNKNOWN,
    SentencePieceModel,
)

WS = "▁"


# ---------------------------------------------------------------------------
# protobuf writer (test-only)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's complement, like int32/int64 on the wire
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _piece_msg(piece: str, score: float, ptype: int = NORMAL) -> bytes:
    b = _ld(1, piece.encode("utf-8")) + _tag(2, 5) + struct.pack("<f", score)
    if ptype != NORMAL:
        b += _tag(3, 0) + _varint(ptype)
    return b


def build_model_bytes(
    pieces,  # [(piece, score, type), ...]
    model_type: int = UNIGRAM,
    byte_fallback: bool = False,
    add_dummy_prefix: bool = True,
    remove_extra_whitespaces: bool = False,
    unk_id: int = 0,
    bos_id: int = 1,
    eos_id: int = 2,
    pad_id: int = -1,
) -> bytes:
    trainer = (
        _tag(3, 0) + _varint(model_type)
        + _tag(35, 0) + _varint(int(byte_fallback))
        + _tag(40, 0) + _varint(unk_id)
        + _tag(41, 0) + _varint(bos_id)
        + _tag(42, 0) + _varint(eos_id)
        + _tag(43, 0) + _varint(pad_id)
    )
    normalizer = (
        _tag(3, 0) + _varint(int(add_dummy_prefix))
        + _tag(4, 0) + _varint(int(remove_extra_whitespaces))
        + _tag(5, 0) + _varint(1)  # escape_whitespaces
    )
    body = b"".join(_ld(1, _piece_msg(*p)) for p in pieces)
    return body + _ld(2, trainer) + _ld(3, normalizer)


def llama_like_pieces(extra):
    """<unk>/<s>/</s> + 256 byte pieces + normal pieces, LLaMA layout."""
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL)]
    pieces += [(f"<0x{i:02X}>", -100.0 - i * 1e-3, BYTE) for i in range(256)]
    pieces += [(p, s, NORMAL) for p, s in extra]
    return pieces


TINY_VOCAB = [
    (WS, -3.0), ("a", -1.5), ("b", -2.0), ("c", -2.5), ("d", -3.5),
    ("ab", -2.4), ("abc", -4.2), ("bc", -2.1), (WS + "a", -2.2),
    (WS + "ab", -3.9), ("b" + WS + "a", -1.0), ("cd", -5.9),
]


def tiny_model(**kw) -> SentencePieceModel:
    return SentencePieceModel.from_bytes(
        build_model_bytes(llama_like_pieces(TINY_VOCAB), **kw)
    )


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def test_parse_roundtrip_fields():
    sp = tiny_model(byte_fallback=True)
    assert sp.model_type == UNIGRAM
    assert (sp.unk_id, sp.bos_id, sp.eos_id, sp.pad_id) == (0, 1, 2, -1)
    assert sp.byte_fallback
    assert sp.vocab_size() == 3 + 256 + len(TINY_VOCAB)
    assert sp.id_to_piece(0) == "<unk>"
    assert sp.piece_to_id("<0x41>") == 3 + 0x41
    assert sp.piece_to_id("ab") == 3 + 256 + 5
    assert sp.piece_to_id("no-such-piece") == sp.unk_id
    assert sp.normalizer["add_dummy_prefix"]
    assert not sp.normalizer["remove_extra_whitespaces"]


def test_parse_rejects_garbage():
    with pytest.raises((ValueError, IndexError)):
        SentencePieceModel.from_bytes(b"not a protobuf at all")


def test_charsmap_guard():
    data = build_model_bytes(llama_like_pieces(TINY_VOCAB))
    data += _ld(3, _ld(2, b"\x01\x02\x03"))  # normalizer with a charsmap
    with pytest.raises(NotImplementedError):
        SentencePieceModel.from_bytes(data)
    sp = SentencePieceModel.from_bytes(data, allow_charsmap=True)
    assert sp.encode("ab")


# ---------------------------------------------------------------------------
# unigram Viterbi
# ---------------------------------------------------------------------------


def _brute_best(s, match, unk_score):
    """Exponential best-segmentation search (ground truth)."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def rec(i):
        if i == len(s):
            return 0.0, ()
        best = rec(i + 1)
        best = (best[0] + unk_score, (s[i : i + 1],) + best[1])
        for j in range(i + 1, len(s) + 1):
            hit = match.get(s[i:j])
            if hit is not None:
                sub = rec(j)
                cand = (sub[0] + hit[1], (s[i:j],) + sub[1])
                if cand[0] > best[0]:
                    best = cand
        return best

    return rec(0)


def test_viterbi_matches_bruteforce():
    sp = tiny_model()
    rng = np.random.default_rng(0)
    alphabet = list("abcd") + [" "]
    for _ in range(40):
        text = "".join(rng.choice(alphabet) for _ in range(int(rng.integers(1, 14))))
        norm = sp._normalize(text)
        if not norm:
            continue
        got = sp._viterbi(norm)
        score_got = sum(
            sp._matchable.get(seg, (0, sp._unk_score))[1] for seg in got
        )
        score_best, _ = _brute_best(norm, sp._matchable, sp._unk_score)
        assert abs(score_got - score_best) < 1e-6, (text, got, score_best)


def test_viterbi_matches_hf_tokenizers_unigram():
    """Independent oracle: the HF `tokenizers` Unigram lattice over the
    same vocab/scores (no pre-tokenizer, so pieces may span the escaped
    whitespace exactly like sentencepiece's lattice)."""
    from tokenizers import Tokenizer, models, normalizers

    sp = tiny_model()
    vocab = [("<unk>", 0.0)] + TINY_VOCAB
    oracle = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    oracle.normalizer = normalizers.Replace(" ", WS)

    rng = np.random.default_rng(1)
    alphabet = list("abcd") + [" "]
    for _ in range(40):
        text = "a" + "".join(
            rng.choice(alphabet) for _ in range(int(rng.integers(0, 12)))
        )
        got = [sp.id_to_piece(i) for i in sp.encode(text)]
        # oracle input: replicate add_dummy_prefix by hand
        want = oracle.encode(" " + text).tokens
        # oracle emits '<unk>' tokens; ours emits the unk piece too when
        # byte_fallback is off — compare surface segmentations
        got = ["<unk>" if sp.piece_to_id(t) == sp.unk_id else t for t in got]
        assert got == want, (text, got, want)


def test_encode_basics_and_dummy_prefix():
    sp = tiny_model()
    # "ab a": dummy prefix + escape -> "▁ab▁a"; best: ▁ab(-3.9) ... vs
    # ▁(-3.0)+ab(-2.4)+ b▁a? "▁ab▁a" alternatives — just assert decode
    ids = sp.encode("ab a")
    assert all(0 <= i < sp.vocab_size() for i in ids)
    assert sp.decode(ids) == "ab a"
    assert sp.encode("") == []


def test_remove_extra_whitespaces():
    sp_keep = tiny_model(remove_extra_whitespaces=False)
    sp_rm = tiny_model(remove_extra_whitespaces=True)
    a = sp_keep.decode(sp_keep.encode("a  b"))
    b = sp_rm.decode(sp_rm.encode("a  b"))
    assert a == "a  b"
    assert b == "a b"


def test_byte_fallback():
    sp = tiny_model(byte_fallback=True)
    ids = sp.encode("aζb")  # ζ is not in the vocab -> 2 UTF-8 bytes
    pieces = [sp.id_to_piece(i) for i in ids]
    assert "<0xCE>" in pieces and "<0xB6>" in pieces
    assert sp.unk_id not in ids
    assert sp.decode(ids) == "aζb"
    # without byte fallback the char collapses to unk
    sp2 = tiny_model(byte_fallback=False)
    assert sp.unk_id in sp2.encode("aζb")


def test_adjacent_unknowns_merge_to_one_unk():
    # sentencepiece emits ONE unk piece for an adjacent unknown span
    # (unigram_model.cc PopulateNodes + id resolution), not one per char —
    # token counts feed the preprocess_v1 masking arithmetic
    sp = tiny_model(byte_fallback=False)
    one = sp.encode("aζb")
    three = sp.encode("aζζζb")
    assert one == three
    assert sum(1 for i in three if i == sp.unk_id) == 1
    # a known piece between two unknown spans keeps them separate
    ids = sp.encode("ζaζ")
    assert sum(1 for i in ids if i == sp.unk_id) == 2


def test_decode_skips_control_and_merges_bytes():
    sp = tiny_model(byte_fallback=True)
    ids = [sp.bos_id] + sp.encode("ab") + [sp.eos_id]
    assert sp.decode(ids) == "ab"


# ---------------------------------------------------------------------------
# spm-BPE
# ---------------------------------------------------------------------------


def test_bpe_merge_order():
    """HIGHER score merges first. With no 'abc' super-piece, the winning
    first merge decides the final segmentation of 'abc'."""
    def model(ab_score, bc_score):
        pieces = [("a", -1.0), ("b", -1.0), ("c", -1.0),
                  ("ab", ab_score), ("bc", bc_score)]
        return SentencePieceModel.from_bytes(
            build_model_bytes(llama_like_pieces(pieces), model_type=BPE,
                              add_dummy_prefix=False)
        )

    assert model(-1.0, -2.0)._bpe("abc") == ["ab", "c"]
    assert model(-2.0, -1.0)._bpe("abc") == ["a", "bc"]

    # merges run to completion: 'bc' (-2.1) beats 'ab' (-2.4) first, then
    # ('a','bc') -> 'abc' exists in TINY_VOCAB so it merges too
    sp = SentencePieceModel.from_bytes(
        build_model_bytes(llama_like_pieces(TINY_VOCAB), model_type=BPE,
                          add_dummy_prefix=False)
    )
    assert sp.model_type == BPE
    ids = sp.encode("abc")
    assert [sp.id_to_piece(i) for i in ids] == ["abc"]


def test_bpe_leftmost_tiebreak():
    pieces = [("x", -1.0), ("y", -1.0), ("xy", -2.0), ("yx", -2.0)]
    sp = SentencePieceModel.from_bytes(
        build_model_bytes(llama_like_pieces(pieces), model_type=BPE,
                          add_dummy_prefix=False)
    )
    # 'xyx': both ('x','y')->'xy' and ('y','x')->'yx' score -2.0; leftmost
    # wins, so 'xy' merges first leaving ['xy','x']
    assert sp._bpe("xyx") == ["xy", "x"]


def test_bpe_unknown_chars_fall_back():
    sp = SentencePieceModel.from_bytes(
        build_model_bytes(llama_like_pieces(TINY_VOCAB), model_type=BPE,
                          byte_fallback=True, add_dummy_prefix=False)
    )
    ids = sp.encode("aζ")
    pieces = [sp.id_to_piece(i) for i in ids]
    assert pieces[0] == "a" and "<0xCE>" in pieces


# ---------------------------------------------------------------------------
# HFTokenizer integration (surgery replay on a 32000-piece model)
# ---------------------------------------------------------------------------


def _write_vicuna_like_model(tmp_path, n_vocab=32000):
    """LLaMA-layout model with exactly n_vocab pieces: 3 specials + 256
    bytes + filler normal pieces + the tiny vocab at the end."""
    filler = n_vocab - 3 - 256 - len(TINY_VOCAB)
    extra = [(f"piece{i}" + WS, -50.0) for i in range(filler)] + TINY_VOCAB
    data = build_model_bytes(llama_like_pieces(extra), byte_fallback=True)
    p = tmp_path / "tokenizer.model"
    p.write_bytes(data)
    return str(p)


def test_hftokenizer_spm_backend_surgery(tmp_path):
    """The full builder.py:113-152 surgery replay on a bare
    tokenizer.model: time tokens land at 32000..32099, <hand_traj>=32100
    (the vocab contract hard-coded at handsonvlm.py:146,349,609)."""
    from handsonvlm_tpu.data.tokenization import HFTokenizer

    path = _write_vicuna_like_model(tmp_path)
    tok = HFTokenizer(path, model_max_length=2048)
    assert len(tok) == 32101
    assert tok.time_token_ids == list(range(32000, 32100))
    assert tok.hand_token_id == 32100
    assert (tok.bos_token_id, tok.eos_token_id) == (1, 2)
    assert tok.pad_token_id == 0  # pad_id=-1 -> unk fallback

    ids = tok.encode("a <t5> b <hand_traj>")
    assert ids[0] == 1  # BOS once
    assert 32005 in ids and 32100 in ids
    assert ids.count(1) == 1
    # added tokens never get split into pieces
    assert "<t5>" in tok.decode(ids)

    bins = tok.add_pixel_tokens(4)
    assert bins == [32101, 32102, 32103, 32104]


def test_hftokenizer_spm_backend_image_splice(tmp_path):
    """tokenizer_image_token over the spm backend: the -200 sentinel
    arithmetic (BOS offset handling) works on real encode output."""
    from handsonvlm_tpu.constants import IMAGE_TOKEN_INDEX
    from handsonvlm_tpu.data.tokenization import HFTokenizer, tokenizer_image_token

    tok = HFTokenizer(_write_vicuna_like_model(tmp_path))
    ids = tokenizer_image_token("<image>\nab a", tok)
    assert ids[0] == tok.bos_token_id
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def test_hftokenizer_spm_preprocess_v1(tmp_path):
    """preprocess_v1 masking arithmetic over the spm backend produces a
    usable (non-dropped) sample with assistant-only labels."""
    from handsonvlm_tpu.constants import IGNORE_INDEX
    from handsonvlm_tpu.data.tokenization import HFTokenizer, preprocess_v1

    tok = HFTokenizer(_write_vicuna_like_model(tmp_path))
    sources = [[
        {"from": "human", "value": "ab a b"},
        {"from": "gpt", "value": "a b ab"},
    ]]
    out = preprocess_v1(sources, tok, has_image=False)
    labels = out["labels"][0]
    kept = labels != IGNORE_INDEX
    assert kept.any(), "sample was dropped (tokenization mismatch)"
    assert not kept[0]  # BOS masked
