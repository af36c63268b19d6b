"""Tokenizer round-trip and contract tests (vocab assets from the reference
checkout; skipped if unavailable)."""
import numpy as np
import pytest

from minddiffusion_tpu.text.assets import resolve_asset


def _have(name):
    try:
        resolve_asset(name)
        return True
    except FileNotFoundError:
        return False


needs_bpe = pytest.mark.skipif(not _have("bpe_simple_vocab_16e6.txt.gz"),
                               reason="CLIP BPE merges asset unavailable")
needs_zh = pytest.mark.skipif(not _have("vocab_zh.txt"),
                              reason="zh wordpiece vocab unavailable")


@needs_bpe
def test_clip_bpe_roundtrip_and_contract():
    from minddiffusion_tpu.text.bpe_clip import ClipBpeTokenizer

    tok = ClipBpeTokenizer()
    assert len(tok.encoder) == 49408
    assert tok.sot_id == 49406 and tok.eot_id == 49407

    ids = tok.encode("a photograph of an astronaut riding a horse")
    assert ids and all(0 <= i < 49406 for i in ids)
    assert tok.decode(ids) == "a photograph of an astronaut riding a horse"

    arr = tok.tokenize(["hello world", ""])
    assert arr.shape == (2, 77) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot_id
    assert arr[1, 0] == tok.sot_id and arr[1, 1] == tok.eot_id
    # row 0: sot, tokens..., eot, zeros
    eot_pos = int(np.argmax(arr[0] == tok.eot_id))
    assert (arr[0, eot_pos + 1:] == 0).all()

    # known CLIP encoding spot-checks (stable public values)
    assert tok.encode("hello world") == [3306, 1002]
    assert tok.encode("a diagram") == [320, 22697]
    assert tok.encode("a photograph of an astronaut riding a horse") == [
        320, 8853, 539, 550, 18376, 6765, 320, 4558]

    # truncation keeps EOT last
    long = tok.tokenize(" ".join(["word"] * 200))
    assert long.shape == (1, 77)
    assert long[0, -1] == tok.eot_id


@needs_zh
def test_wordpiece_zh_roundtrip_and_contract():
    from minddiffusion_tpu.text.wordpiece_zh import WordpieceZhTokenizer

    tok = WordpieceZhTokenizer()
    assert len(tok.encoder) == 21128

    text = "来自太空的长城照片"
    ids = tok.encode(text)
    assert ids and all(i != tok.unk_id for i in ids)
    assert tok.decode(ids) == text

    # per-CJK-char splitting: each char its own token
    assert len(tok.encode("长城")) == 2

    # mixed latin goes through lowercase wordpiece
    ids2 = tok.encode("Hello,世界")
    assert tok.decode(ids2) == "hello,世界"

    arr = tok.tokenize([text])
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.cls_id
    sep_pos = int(np.argmax(arr[0] == tok.sep_id))
    assert sep_pos == len(ids) + 1
    assert (arr[0, sep_pos + 1:] == 0).all()


def test_glide_padded_tokens_and_mask():
    from minddiffusion_tpu.text.glide_text import padded_tokens_and_mask

    toks, mask = padded_tokens_and_mask([5, 6, 7], 6, end_token=99)
    assert toks == [5, 6, 7, 99, 99, 99]
    assert mask == [1, 1, 1, 0, 0, 0]
    toks2, mask2 = padded_tokens_and_mask(list(range(10)), 4, end_token=99)
    assert toks2 == [0, 1, 2, 3] and mask2 == [1, 1, 1, 1]


# --- vendored sentencepiece runtime (text/sentencepiece_mini.py) ------------

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field_bytes(num, payload):
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _field_varint(num, val):
    return _varint(num << 3) + _varint(val)


def _piece(text, score, ptype=1):
    import struct
    body = _field_bytes(1, text.encode("utf-8"))
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    body += _field_varint(3, ptype)
    return _field_bytes(1, body)


def _make_model(pieces, model_type=1):
    """pieces: list of (text, score, type). Hand-encoded ModelProto."""
    data = b"".join(_piece(*p) for p in pieces)
    trainer = _field_varint(3, model_type) + _field_varint(40, 0)
    data += _field_bytes(2, trainer)
    data += _field_bytes(3, _field_varint(3, 1))  # add_dummy_prefix=True
    return data


def test_sentencepiece_mini_unigram(tmp_path):
    # vocab chosen so Viterbi must pick the two-char piece over singles
    pieces = [
        ("<unk>", 0.0, 2),
        ("▁", -2.0, 1),
        ("你", -3.0, 1),        # ni
        ("好", -3.0, 1),        # hao
        ("你好", -4.0, 1),  # nihao (beats -3 + -3)
        ("▁你好", -9.0, 1),  # worse than split
        ("a", -5.0, 1), ("b", -5.0, 1), ("ab", -7.0, 1),
    ]
    path = tmp_path / "toy.model"
    path.write_bytes(_make_model(pieces))
    from minddiffusion_tpu.text.glide_text import GlideSentencePieceTokenizer

    tok = GlideSentencePieceTokenizer(str(path))
    assert tok.n_vocab == len(pieces) + 1
    ids = tok.encode("你好")
    # normalized "▁你好": ▁(-2) + 你好(-4) = -6 beats ▁你好(-9) and singles(-8)
    assert ids == [1, 4]
    assert tok.decode(ids + [tok.end_token]) == "你好"
    # unknown char falls back to unk id
    ids2 = tok.encode("你ж")
    assert ids2[-1] == 0
    # ab: "ab" piece scores -7 < a+b -10 -> merged piece wins
    assert tok.encode("ab") == [1, 8]


def test_sentencepiece_mini_bpe(tmp_path):
    pieces = [
        ("<unk>", 0.0, 2),
        ("▁", -1.0, 1),
        ("a", -2.0, 1), ("b", -2.0, 1), ("c", -2.0, 1),
        ("ab", -0.5, 1),   # best-ranked merge
        ("abc", -0.7, 1),
    ]
    path = tmp_path / "toy_bpe.model"
    path.write_bytes(_make_model(pieces, model_type=2))
    from minddiffusion_tpu.text.sentencepiece_mini import SentencePieceProcessor

    sp = SentencePieceProcessor(str(path))
    # "abc" -> ▁ a b c -> merge ab (-0.5) -> merge abc (-0.7)
    assert sp.EncodeAsPieces("abc") == ["▁", "abc"]
    assert sp.DecodeIds(sp.EncodeAsIds("abc")) == "abc"
