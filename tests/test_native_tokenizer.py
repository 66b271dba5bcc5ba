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
    lib = native.build_native()
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
    """Uncased mode (full-Unicode lowercase + NFD accent strip in the
    Python pre-pass, cased C++ matching behind it) matches the pure-Python
    uncased tokenizer, including non-ASCII case folding and accents."""
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
