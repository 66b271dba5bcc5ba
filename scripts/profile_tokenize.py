"""Startup tokenization cost at MSCOCO-CN scale (VERDICT r2 weak #5):
~566k captions x 2 languages.  Times the TrainLoader._tokenize_all path's
core — batch WordPiece encode — with the native C++ tokenizer and the pure
Python one, plus the Unigram (XLM-R) tokenizer, on a synthesized corpus.

Usage: python scripts/profile_tokenize.py [n_texts]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
MAX_LEN = 64

_WORDS = ("a man rides his red bike near the old bridge while two dogs run "
          "across a green field and children play football by the river "
          "under a cloudy sky cat house tree water sun light blue small "
          "large walk jump look stand hold carry wear").split()


def make_corpus(n, seed=0):
    rs = np.random.RandomState(seed)
    lens = rs.randint(8, 16, n)
    idx = rs.randint(0, len(_WORDS), lens.sum())
    out, pos = [], 0
    for ln in lens:
        out.append(" ".join(_WORDS[i] for i in idx[pos: pos + ln]))
        pos += ln
    return out


def main():
    import tempfile

    from leccr_tpu.data.tokenizers import (
        UnigramTokenizer,
        WordPieceTokenizer,
        write_tiny_unigram_vocab,
        write_tiny_wordpiece_vocab,
    )

    tmp = Path(tempfile.mkdtemp(prefix="tok_prof_"))
    wp_vocab = tmp / "vocab.txt"
    write_tiny_wordpiece_vocab(str(wp_vocab), _WORDS)
    uni_vocab = tmp / "uni.tsv"
    write_tiny_unigram_vocab(str(uni_vocab), _WORDS)

    texts = make_corpus(N)
    print(f"corpus: {N} texts, ~{np.mean([len(t) for t in texts[:1000]]):.0f}"
          " chars")

    results = {}
    try:
        from leccr_tpu.data.native_tokenizer import NativeWordPieceTokenizer

        nat = NativeWordPieceTokenizer(str(wp_vocab), lowercase=True)
        t0 = time.time()
        ids, mask = nat.encode(texts, MAX_LEN)
        results["native_cpp"] = time.time() - t0
    except Exception as exc:  # noqa: BLE001
        print("native tokenizer unavailable:", exc)

    py = WordPieceTokenizer(str(wp_vocab), lowercase=True)
    sl = texts[: N // 10]  # python path: time a 10% slice, extrapolate
    t0 = time.time()
    py.encode(sl, MAX_LEN)
    results["python_wordpiece_x10"] = (time.time() - t0) * 10

    uni = UnigramTokenizer(str(uni_vocab))
    t0 = time.time()
    uni.encode(sl, MAX_LEN)
    results["python_unigram_x10"] = (time.time() - t0) * 10

    try:
        from leccr_tpu.data.native_tokenizer import NativeUnigramTokenizer

        nat_uni = NativeUnigramTokenizer(uni)
        t0 = time.time()
        nat_uni.encode(texts, MAX_LEN)
        results["native_unigram"] = time.time() - t0
    except Exception as exc:  # noqa: BLE001
        print("native unigram unavailable:", exc)

    for k, v in results.items():
        print(f"{k}: {v:.1f} s for {N} texts "
              f"({N / v / 1000:.0f}k texts/s)")


if __name__ == "__main__":
    main()
