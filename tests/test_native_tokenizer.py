"""Parity of the C++ batch WordPiece tokenizer against the Python
implementation (and hence HF, via test_tokenizers.py)."""

import numpy as np
import pytest

from leccr_tpu.data.tokenizers import (
    WordPieceTokenizer,
    write_tiny_wordpiece_vocab,
)

native = pytest.importorskip("leccr_tpu.data.native_tokenizer")


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("nat") / "vocab.txt"
    words = ("a man rides his red bike near the bridge two dogs running "
             "across green field cat 猫 犬").split()
    write_tiny_wordpiece_vocab(str(path), words)
    return str(path)


@pytest.fixture(scope="module")
def pair(vocab_file):
    # force=True: the .so is not committed; tests must prove the from-source
    # build works (ADVICE r1), not just load a stale binary
    lib = native.build_native(force=True)
    if lib is None:
        pytest.skip("no C++ toolchain")
    return (WordPieceTokenizer(vocab_file, lowercase=False),
            native.NativeWordPieceTokenizer(vocab_file, lowercase=False))


SENTENCES = [
    "a man rides his red bike",
    "two dogs, running!  across the green field",
    "unknownwordhere and the 猫 sat with the 犬",
    "punctuation...everywhere, right?",
    "",
    "a " * 50,  # truncation
]


def test_native_matches_python(pair):
    py, nat = pair
    ids_p, mask_p = py.encode(SENTENCES, max_length=16)
    ids_n, mask_n = nat.encode(SENTENCES, max_length=16)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_lowercase(vocab_file):
    """Uncased mode — full-Unicode lowercase + NFD accent strip run INSIDE
    the C++ library — matches the pure-Python uncased tokenizer, including
    non-ASCII case folding and accents."""
    if native.build_native() is None:
        pytest.skip("no C++ toolchain")
    py = WordPieceTokenizer(vocab_file, lowercase=True)
    nat = native.NativeWordPieceTokenizer(vocab_file, lowercase=True)
    texts = ["A MAN Rides His RED bike", "Two DOGS",
             "a mán rídes hìs réd bïke", "ACROSS the GRÉÉN FIELD",
             "ÀÁÂ ãäå çñö"]
    ids_p, mask_p = py.encode(texts, max_length=12)
    ids_n, mask_n = nat.encode(texts, max_length=12)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    # the accented variant must normalize to the same ids as the plain one
    plain, _ = nat.encode(["a man rides his red bike"], max_length=12)
    np.testing.assert_array_equal(ids_n[2], plain[0])


HARD_UNCASED = [
    "Naïve CAFÉ Über résumé",            # latin accents
    "ΣΑΣ ΟΔΟΣ Σ ΝΙΚΟΣ3",                 # Greek Final_Sigma contexts
    "İstanbul II İİ",                    # U+0130 multi-char lowercase
    "한국어 조선말",                      # Hangul -> NFD Jamo
    "ＦＵＬＬｗｉｄｔｈ，ＡＢＣ。",       # fullwidth Latin + CJK punct
    "Ǆemal ǅak ǆin",                     # titlecase digraphs
    "tschüß GROẞ",                       # sharp s forms
    "Ĳsselmeer ŉgoro",                   # ligature-like letters
]


def test_native_uncased_matches_hf_hard_cases(tmp_path):
    """The native uncased path vs HF BertTokenizer(do_lower_case=True) on
    normalization-sensitive scripts.  The vocab is built from HF's own
    normalized word output so matches are real (not [UNK]-vs-[UNK])."""
    from transformers import BertTokenizer

    if native.build_native() is None:
        pytest.skip("no C++ toolchain")
    # pass 1: harvest HF-normalized words so the vocab covers them
    seed_vocab = tmp_path / "seed.txt"
    write_tiny_wordpiece_vocab(str(seed_vocab), ["a"])
    hf_seed = BertTokenizer(str(seed_vocab), do_lower_case=True)
    words = set()
    for s in HARD_UNCASED:
        words.update(hf_seed.basic_tokenizer.tokenize(s))
    vocab = tmp_path / "vocab.txt"
    write_tiny_wordpiece_vocab(str(vocab), sorted(words))

    hf = BertTokenizer(str(vocab), do_lower_case=True)
    nat = native.NativeWordPieceTokenizer(str(vocab), lowercase=True)
    py = WordPieceTokenizer(str(vocab), lowercase=True)
    for s in HARD_UNCASED:
        want = hf(s, padding="max_length", truncation=True, max_length=24,
                  return_tensors="np")
        ids_n, mask_n = nat.encode([s], max_length=24)
        ids_p, _ = py.encode([s], max_length=24)
        np.testing.assert_array_equal(
            ids_n[0], want["input_ids"][0].astype(np.int32), err_msg=s)
        np.testing.assert_array_equal(
            ids_n[0], ids_p[0], err_msg=s)
        np.testing.assert_array_equal(
            mask_n[0], want["attention_mask"][0].astype(np.int32), err_msg=s)


def test_native_strip_accents_override(tmp_path):
    """strip_accents=False with lowercase=True (the HF override knob) keeps
    accents while lowering."""
    from transformers import BertTokenizer

    if native.build_native() is None:
        pytest.skip("no C++ toolchain")
    vocab = tmp_path / "vocab.txt"
    write_tiny_wordpiece_vocab(str(vocab), ["café", "cafe", "über", "uber"])
    hf = BertTokenizer(str(vocab), do_lower_case=True, strip_accents=False)
    nat = native.NativeWordPieceTokenizer(str(vocab), lowercase=True,
                                          strip_accents=False)
    for s in ["CAFÉ", "Über", "cafe"]:
        want = hf(s)["input_ids"]
        ids, mask = nat.encode([s], max_length=8)
        got = [int(x) for x in ids[0][: int(mask[0].sum())]]
        assert got == want, (s, got, want)


# ------------------------------------------------------- Unigram (XLM-R)


@pytest.fixture(scope="module")
def uni_pair(tmp_path_factory):
    from leccr_tpu.data.tokenizers import (
        UnigramTokenizer,
        write_tiny_unigram_vocab,
    )

    path = tmp_path_factory.mktemp("uni") / "uni.tsv"
    words = ("a man rides his red bike near the bridge two dogs running "
             "across green field he hello world 猫 犬").split()
    write_tiny_unigram_vocab(str(path), words)
    py = UnigramTokenizer(str(path))
    try:
        nat = native.NativeUnigramTokenizer(py)
    except RuntimeError:
        pytest.skip("no C++ toolchain")
    return py, nat


UNI_SENTENCES = [
    "a man rides his red bike",
    "two dogs running across the green field",
    "hello world he",
    "unknownz with the 猫 and 犬",
    "",
    "   spaces   everywhere   ",
    "ħ849 ψcompletely-unseen ©∂字",
]


def test_native_unigram_matches_python(uni_pair):
    py, nat = uni_pair
    for width in (16, 32):
        a_ids, a_mask = py.encode(UNI_SENTENCES, width)
        b_ids, b_mask = nat.encode(UNI_SENTENCES, width)
        np.testing.assert_array_equal(a_ids, b_ids)
        np.testing.assert_array_equal(a_mask, b_mask)


def test_native_unigram_unicode_whitespace(uni_pair):
    """Python tokenize() splits with str.split() — ANY Unicode whitespace.
    The train loader feeds raw generated captions (no normalize_caption
    pass), so e.g. U+00A0 must separate words in the native encoder exactly
    as it does in the Python eval path (advisor r3, medium)."""
    py, nat = uni_pair
    texts = [
        "hello\u00a0world",            # NBSP
        "a\u2009man\u3000rides",      # thin, ideographic space
        "two\u2028dogs\u0085running",  # line sep, NEL
        "\u00a0\u00a0he\u202f",       # narrow NBSP
    ]
    a_ids, a_mask = py.encode(texts, 16)
    b_ids, b_mask = nat.encode(texts, 16)
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_native_unigram_tied_scores(tmp_path):
    """Exactly tied segmentations (duplicated scores, common in real
    sentencepiece vocabs) must resolve identically: ascending start scan
    with strict '>' — the LONGEST piece wins a tie (advisor r3, low)."""
    from leccr_tpu.data.tokenizers import UnigramTokenizer

    # "▁abc" can split as ▁a+bc / ▁ab+c / ▁abc+nothing … with equal sums
    lines = ["<s>\t0", "<pad>\t0", "</s>\t0", "<unk>\t0",
             "▁a\t-2.0", "▁ab\t-4.0", "▁abc\t-6.0",
             "a\t-2.0", "b\t-2.0", "c\t-2.0",
             "ab\t-4.0", "bc\t-4.0", "abc\t-6.0"]
    path = tmp_path / "tied.tsv"
    path.write_text("\n".join(lines), encoding="utf-8")
    py = UnigramTokenizer(str(path))
    nat = native.NativeUnigramTokenizer(py)
    texts = ["abc", "abcabc", "abc ab a", "aabbcc abcabcabc"]
    a_ids, a_mask = py.encode(texts, 24)
    b_ids, b_mask = nat.encode(texts, 24)
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_native_unigram_byte_fallback(tmp_path):
    """With <0xXX> byte pieces defined (sentencepiece --byte_fallback),
    unseen characters must emit their UTF-8 bytes identically in both
    implementations."""
    from leccr_tpu.data.tokenizers import UnigramTokenizer

    lines = ["<s>\t0", "<pad>\t0", "</s>\t0", "<unk>\t0",
             "▁ab\t-1.0", "▁\t-5.0", "a\t-3.0", "b\t-3.0"]
    base = len(lines)
    for bb in range(256):
        lines.append(f"<0x{bb:02X}>\t-20.0")
    path = tmp_path / "bytes.tsv"
    path.write_text("\n".join(lines), encoding="utf-8")
    py = UnigramTokenizer(str(path))
    # TSV loads don't auto-register byte pieces; mirror the .model layout
    py.byte_ids = {bb: base + bb for bb in range(256)}
    for piece in list(py.pieces):
        if piece.startswith("<0x"):
            del py.pieces[piece]
    nat = native.NativeUnigramTokenizer(py)
    texts = ["ab éx", "字ab"]
    a_ids, a_mask = py.encode(texts, 24)
    b_ids, b_mask = nat.encode(texts, 24)
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_array_equal(a_mask, b_mask)


def test_native_unigram_truncation_and_large_batch(uni_pair):
    py, nat = uni_pair
    texts = ["a man rides his red bike near the bridge " * 6] * 1500
    a_ids, a_mask = py.encode(texts[:3], 10)
    b_ids, b_mask = nat.encode(texts, 10)
    np.testing.assert_array_equal(a_ids, b_ids[:3])
    assert (b_ids == b_ids[0]).all() and (b_mask == b_mask[0]).all()


def test_trainloader_engages_native_unigram(tmp_path):
    """The xlmr TrainLoader path must pick up the C++ unigram encoder for
    its offline tokenization pass (startup at MSCOCO scale is ~70 s pure
    Python vs ~4 s native for 600k captions — scripts/profile_tokenize.py)."""
    import jax  # noqa: F401  (conftest pins CPU)

    from leccr_tpu.config import tiny_test_config
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 8
    cfg.data.synthetic_eval_images = 4
    cfg.train.batch_size_train = 4
    cfg.model.text.kind = "xlmr"
    cfg.model.text.pad_token_id = 1
    cfg.model.text.type_vocab_size = 1
    trainer = Trainer(cfg, devices=None)
    assert isinstance(trainer.train_loader._native,
                      native.NativeUnigramTokenizer)
