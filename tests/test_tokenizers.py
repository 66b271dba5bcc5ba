"""Tokenizer parity vs HuggingFace implementations built from local vocab
files (no network — SURVEY.md §7 'tokenization parity')."""

import gzip
from pathlib import Path

import numpy as np
import pytest

from leccr_tpu.data.tokenizers import (
    ClipBPETokenizer,
    WordPieceTokenizer,
    write_tiny_wordpiece_vocab,
)

SENTENCES = [
    "a man rides his red bike near the bridge",
    "two dogs, running across a green field!",
    "the quick brown fox — jumps over 12 lazy dogs?",
    "CaPiTaLs and punc.tu.ation's edge-cases",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    words = ("a man rides his red bike near the bridge two dogs running "
             "across green field quick brown fox jumps over lazy and "
             "capitals punc tu ation s edge cases").split()
    write_tiny_wordpiece_vocab(str(path), words)
    return str(path)


def test_wordpiece_matches_hf_uncased(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file, do_lower_case=True)
    mine = WordPieceTokenizer(vocab_file, lowercase=True)
    for s in SENTENCES:
        assert mine.tokenize(s) == hf.tokenize(s), s


def test_wordpiece_matches_hf_cased(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file, do_lower_case=False)
    mine = WordPieceTokenizer(vocab_file, lowercase=False)
    for s in SENTENCES:
        assert mine.tokenize(s) == hf.tokenize(s), s


def test_wordpiece_encode_matches_hf(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file, do_lower_case=False)
    mine = WordPieceTokenizer(vocab_file, lowercase=False)
    want = hf(SENTENCES, padding="max_length", truncation=True, max_length=16,
              return_tensors="np")
    ids, mask = mine.encode(SENTENCES, max_length=16)
    np.testing.assert_array_equal(ids, want["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, want["attention_mask"].astype(np.int32))


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    """Small OpenAI-format merges file + the matching HF vocab.json."""
    tmp = tmp_path_factory.mktemp("clip")
    merges = [
        "#version: 0.2",
        "t h", "th e</w>", "a</w>", "d o", "do g</w>", "r u", "ru n</w>",
        "o v", "ov er</w>", "e r", "er </w>",
    ]
    merges_path = tmp / "merges.txt.gz"
    with gzip.open(merges_path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")
    tok = ClipBPETokenizer(str(merges_path))
    import json

    vocab_path = tmp / "vocab.json"
    vocab_path.write_text(json.dumps(tok.encoder))
    merges_plain = tmp / "merges_plain.txt"
    merges_plain.write_text("\n".join(merges) + "\n")
    return str(merges_path), str(vocab_path), str(merges_plain)


def test_clip_bpe_matches_hf(clip_files):
    from transformers import CLIPTokenizer

    merges_gz, vocab_json, merges_plain = clip_files
    mine = ClipBPETokenizer(merges_gz)
    hf = CLIPTokenizer(vocab_json, merges_plain)
    # HF is a valid oracle for non-CJK text only: without ftfy installed it
    # substitutes a BasicTokenizer that splits every CJK char into its own
    # word — a deliberate HF divergence from the OpenAI tokenizer the
    # reference vendors.  CJK parity is pinned against the reference
    # implementation itself in test_clip_bpe_matches_reference_tokenizer.
    for s in ["the dog runs over there", "a over dog the", "hello, world!",
              "pes běží přes ulici",             # cs diacritics
              "der Hund läuft über die Straße",  # de
              "café — «quotes» … ¿3½?",          # symbols, non-ASCII digits
              "मिश्रित scripts مع عربي"]:        # Devanagari + Arabic mix
        got = mine.tokenize(s)
        want = hf(s)["input_ids"][1:-1]  # strip sot/eot
        assert got == want, (s, got, want)


@pytest.mark.skipif(not Path("/root/reference/LECCR/clip").exists(),
                    reason="reference checkout not available")
def test_clip_bpe_matches_reference_tokenizer(clip_files):
    """Pin the full Unicode split behavior against the REFERENCE tokenizer
    (clip/simple_tokenizer.py) run in-process with ftfy stubbed to identity
    (its only role is mojibake repair; clean text passes through).  This is
    the ground truth for the zh/ja caption configs (VERDICT r1 #5)."""
    import importlib.util
    import sys
    import types

    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_simple_tokenizer",
        "/root/reference/LECCR/clip/simple_tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.SimpleTokenizer(clip_files[0])

    mine = ClipBPETokenizer(clip_files[0])
    for s in ["the dog runs over there", "hello, world!",
              "一只狗在跑。这里！",              # zh + CJK punctuation
              "犬が走っています（速い）１２３",  # ja + fullwidth digits
              "１２３ ４５",                     # fullwidth digits alone
              "pes běží přes ulici",
              "der Hund läuft über die Straße",
              "café — «quotes» … ¿3½?",
              "मिश्रित scripts مع عربي",
              "ＡＢＣ ﬁﬂ ŉ"]:                   # fullwidth Latin, ligatures
        assert mine.tokenize(s) == ref.encode(s), s


def test_clip_encode_layout(clip_files):
    mine = ClipBPETokenizer(clip_files[0])
    out = mine.encode(["the dog"], context_length=10)
    assert out.shape == (1, 10)
    assert out[0, 0] == mine.sot
    row = out[0][out[0] != 0]
    assert row[-1] == mine.eot
    # truncation keeps EOT last
    long = mine.encode(["dog " * 50], context_length=8)
    assert long[0, -1] == mine.eot


def test_unigram_tokenizer(tmp_path):
    from leccr_tpu.data.tokenizers import (
        UnigramTokenizer,
        write_tiny_unigram_vocab,
    )

    vocab = tmp_path / "uni.tsv"
    write_tiny_unigram_vocab(str(vocab), ["hello", "world", "he"])
    tok = UnigramTokenizer(str(vocab))
    assert tok.cls_id == 0 and tok.pad_id == 1 and tok.sep_id == 2

    # whole-word pieces win over per-char segmentation
    ids = tok.tokenize("hello world")
    assert ids == [tok.pieces["▁hello"], tok.pieces["▁world"]]

    # unknown word falls back to chars (known) / <unk> (unknown chars)
    ids2 = tok.tokenize("held")
    assert tok.unk_id in ids2 or all(i != tok.unk_id for i in ids2)
    assert len(ids2) >= 2

    # Viterbi prefers higher-scoring segmentation: "hehello"?
    # "▁he" exists as word; "hello" chars exist — ensure determinism
    ids3 = tok.tokenize("he")
    assert ids3 == [tok.pieces["▁he"]]

    # encode layout: <s> ... </s> + padding
    enc, mask = tok.encode(["hello world", "he"], max_length=6)
    assert enc[0][0] == tok.cls_id
    assert enc[0][3] == tok.sep_id
    assert mask[0].sum() == 4
    assert enc[1][2] == tok.sep_id
    assert (enc[1][3:] == tok.pad_id).all()


def test_unigram_viterbi_prefers_best_score(tmp_path):
    from leccr_tpu.data.tokenizers import UnigramTokenizer

    vocab = tmp_path / "v.tsv"
    # "▁ab" (-1) beats "▁a"+"b" (-2-2=-4)
    vocab.write_text(
        "<s>\t0\n<pad>\t0\n</s>\t0\n<unk>\t0\n"
        "▁ab\t-1.0\n▁a\t-2.0\nb\t-2.0\n▁\t-5.0\na\t-3.0\n")
    tok = UnigramTokenizer(str(vocab))
    assert tok.tokenize("ab") == [tok.pieces["▁ab"]]
    # but "▁a"+"b" when the combined piece is absent
    assert tok.tokenize("ab b") == [
        tok.pieces["▁ab"], tok.pieces["▁"], tok.pieces["b"]]


def test_sentencepiece_model_roundtrip(tmp_path):
    """Hand-rolled ModelProto writer -> parser round-trip, and the HF
    XLM-R fairseq id layout on .model loads (specials 0..3, sp id +1)."""
    from leccr_tpu.data.tokenizers import (
        UnigramTokenizer,
        parse_sentencepiece_model,
        write_sentencepiece_model,
    )

    ws = UnigramTokenizer.WS
    pieces = [
        ("<unk>", 0.0, 2),      # UNKNOWN
        ("<s>", 0.0, 3),        # CONTROL
        ("</s>", 0.0, 3),       # CONTROL
        (ws + "hello", -2.5, 1),
        (ws + "world", -3.0, 1),
        (ws, -6.0, 1),
        ("lo", -4.0, 1),
        ("hel", -4.5, 1),
    ] + [(f"<0x{b:02X}>", -10.0, 6) for b in range(256)]
    model = tmp_path / "uni.model"
    write_sentencepiece_model(str(model), pieces)

    parsed = parse_sentencepiece_model(str(model))
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in pieces]
    assert np.allclose([s for _, s, _ in parsed], [s for _, s, _ in pieces])

    tok = UnigramTokenizer(str(model))
    assert (tok.cls_id, tok.pad_id, tok.sep_id, tok.unk_id) == (0, 1, 2, 3)
    # sp id 3 ("▁hello") -> 4 under the fairseq offset
    assert tok.pieces[ws + "hello"] == 4
    assert tok.tokenize("hello world") == [4, 5]
    # Viterbi over subpieces when the whole word is absent
    assert tok.tokenize("hellolo") == [tok.pieces[ws + "hello"],
                                       tok.pieces["lo"]]


def test_sentencepiece_byte_fallback(tmp_path):
    """Characters with no covering piece emit their UTF-8 bytes as <0xXX>
    BYTE pieces (sentencepiece --byte_fallback semantics)."""
    from leccr_tpu.data.tokenizers import (
        UnigramTokenizer,
        write_sentencepiece_model,
    )

    ws = UnigramTokenizer.WS
    pieces = [
        ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
        (ws + "price", -2.0, 1), (ws, -6.0, 1),
    ] + [(f"<0x{b:02X}>", -10.0, 6) for b in range(256)]
    model = tmp_path / "bf.model"
    write_sentencepiece_model(str(model), pieces)
    tok = UnigramTokenizer(str(model))

    ids = tok.tokenize("price €")
    euro = "€".encode("utf-8")  # 3 bytes: e2 82 ac
    expect_tail = [tok.byte_ids[b] for b in euro]
    assert ids[0] == tok.pieces[ws + "price"]
    assert ids[-3:] == expect_tail
    # without byte pieces the same char falls back to <unk>
    tsv = tmp_path / "bf.tsv"
    tsv.write_text("<s>\t0\n<pad>\t0\n</s>\t0\n<unk>\t0\n"
                   f"{ws}price\t-2.0\n{ws}\t-6.0", encoding="utf-8")
    tok2 = UnigramTokenizer(str(tsv))
    assert tok2.tokenize("price €")[-1] == tok2.unk_id


def test_sentencepiece_parser_skips_unknown_fields(tmp_path):
    """Real .model files carry trainer/normalizer specs (fields 2/3) and
    future fields; the parser must skip them by wire type."""
    from leccr_tpu.data.tokenizers import (
        parse_sentencepiece_model,
        write_sentencepiece_model,
    )

    model = tmp_path / "extra.model"
    write_sentencepiece_model(str(model), [("<unk>", 0.0, 2), ("a", -1.0, 1)])
    blob = model.read_bytes()
    # prepend field 2 (trainer_spec, wire 2), field 4 varint, field 5 fixed32
    extra = b"\x12\x03abc" + b"\x20\x2a" + b"\x2d\x01\x02\x03\x04"
    model.write_bytes(extra + blob + b"\x12\x02xy")
    parsed = parse_sentencepiece_model(str(model))
    assert [p for p, _, _ in parsed] == ["<unk>", "a"]
