"""SentencePiece reader tests over a hand-encoded ModelProto blob."""

import struct

import pytest

from vgqa_tpu.qa.sp_tokenizer import SPACE, SentencePieceBPE, parse_model_proto


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int = 1) -> bytes:
    body = b""
    raw = piece.encode("utf-8")
    body += _varint((1 << 3) | 2) + _varint(len(raw)) + raw
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    body += _varint((3 << 3) | 0) + _varint(ptype)
    return _varint((1 << 3) | 2) + _varint(len(body)) + body


def _build_model(tmp_path):
    # full merge paths exist, as in any real SP-BPE vocab:
    # ▁+h -> ▁h -> ▁he ; l+l -> ll -> llo ; ▁he+llo -> ▁hello
    pieces = [
        ("<unk>", 0.0, 2),
        ("<s>", 0.0, 3),
        ("</s>", 0.0, 3),
        (SPACE + "hello", -1.0, 1),
        (SPACE + "he", -3.0, 1),
        ("llo", -3.5, 1),
        (SPACE + "h", -4.0, 1),
        ("ll", -4.5, 1),
        (SPACE, -10.0, 1),
        ("h", -11.0, 1),
        ("e", -11.0, 1),
        ("l", -11.0, 1),
        ("o", -11.0, 1),
        ("<0x7A>", -20.0, 6),  # 'z'
    ]
    blob = b"".join(_piece(*p) for p in pieces)
    # unknown top-level field must be skipped cleanly
    blob += _varint((2 << 3) | 2) + _varint(3) + b"xyz"
    path = tmp_path / "tokenizer.model"
    path.write_bytes(blob)
    return str(path), pieces


def test_parse_model_proto(tmp_path):
    path, pieces = _build_model(tmp_path)
    parsed = parse_model_proto(open(path, "rb").read())
    assert len(parsed) == len(pieces)
    assert parsed[3] == (SPACE + "hello", -1.0, 1)
    assert parsed[-1][2] == 6


def test_bpe_merges_by_score(tmp_path):
    path, _ = _build_model(tmp_path)
    tok = SentencePieceBPE(path)
    # "hello" should merge all the way to the single best piece
    ids = tok.encode("hello")
    assert ids == [tok.piece_to_id[SPACE + "hello"]]
    assert tok.decode(ids) == "hello"


def test_byte_fallback_roundtrip(tmp_path):
    path, _ = _build_model(tmp_path)
    tok = SentencePieceBPE(path)
    ids = tok.encode("z")
    assert tok.piece_to_id["<0x7A>"] in ids
    assert tok.decode(ids) == "z"


def test_specials_resolved(tmp_path):
    path, _ = _build_model(tmp_path)
    tok = SentencePieceBPE(path)
    assert tok.BOS == tok.piece_to_id["<s>"]
    assert tok.EOS == tok.piece_to_id["</s>"]
    # control pieces never appear in decoded text
    assert tok.decode([tok.BOS] + tok.encode("hello") + [tok.EOS]) == "hello"
