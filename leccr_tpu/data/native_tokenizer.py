"""ctypes binding for the native C++ WordPiece tokenizer
(native/wordpiece.cpp).  Falls back to the pure-Python implementation when
the shared library isn't built; `build_native()` compiles it on demand with
the system toolchain.  Parity with data.tokenizers.WordPieceTokenizer is
enforced in tests/test_native_tokenizer.py."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libleccr_native.so"


def build_native(force: bool = False) -> Optional[Path]:
    """Compile the shared library (make -C native); returns its path or None
    when no toolchain is available."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        if force:
            _LIB_PATH.unlink(missing_ok=True)  # make's mtime check is not enough
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return _LIB_PATH if _LIB_PATH.exists() else None


_lib = None


_ABI_VERSION = 3  # must match wp_abi_version() in native/wordpiece.cpp


def _abi_ok(lib) -> bool:
    try:
        return int(lib.wp_abi_version()) == _ABI_VERSION
    except AttributeError:
        return False  # pre-versioning build


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    if not _abi_ok(lib):
        # stale .so from an older source tree (the wp_create flags-word
        # change would be silently misread) — rebuild from source
        path = build_native(force=True)
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        if not _abi_ok(lib):
            return None
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode_batch.restype = ctypes.c_int
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.uni_create.restype = ctypes.c_void_p
    lib.uni_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_int]
    lib.uni_destroy.argtypes = [ctypes.c_void_p]
    lib.uni_encode_batch.restype = ctypes.c_int
    lib.uni_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


class NativeWordPieceTokenizer:
    """Drop-in batch encoder backed by the C++ library.

    Exposes the same `encode(texts, max_length, pad_to)` contract as the
    Python WordPieceTokenizer.  Raises RuntimeError if the library can't be
    built — callers should catch and fall back."""

    def __init__(self, vocab_file: str, lowercase: bool = False,
                 strip_accents: bool | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        # uncased mode runs fully native: the C++ library does full-Unicode
        # lowercase (incl. Final_Sigma / U+0130) and NFD accent stripping
        # from generated tables.  HF semantics: strip_accents defaults to
        # the lowercase setting.
        self.lowercase = lowercase
        self.strip_accents = (lowercase if strip_accents is None
                              else strip_accents)
        flags = (1 if self.lowercase else 0) | (2 if self.strip_accents else 0)
        self._handle = lib.wp_create(str(vocab_file).encode(), flags)
        if not self._handle:
            raise RuntimeError(f"failed to load vocab {vocab_file}")

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.wp_destroy(self._handle)
            self._handle = None

    def encode(self, texts: Sequence[str], max_length: int,
               pad_to: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
        width = pad_to or max_length
        n = len(texts)
        ids = np.zeros((n, width), np.int32)
        mask = np.zeros((n, width), np.int32)
        arr = (ctypes.c_char_p * n)(
            *[t.encode("utf-8") for t in texts])
        rc = self._lib.wp_encode_batch(
            self._handle, arr, n, max_length, width,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise RuntimeError(f"wp_encode_batch failed: {rc}")
        return ids, mask


class NativeUnigramTokenizer:
    """Drop-in batch encoder for the Unigram/XLM-R tokenizer, backed by the
    C++ library (native/unigram.cpp).

    Vocab/model parsing stays in Python — a data.tokenizers.UnigramTokenizer
    (TSV or real sentencepiece .model) supplies the resolved piece/score/id
    tables; the C++ side only runs the Viterbi segmentation, threaded over
    the batch.  Exposes the same encode(texts, max_length, pad_to) contract.
    lowercase=True is refused (the Python path uses str.lower(), whose
    contextual Final_Sigma rule the native per-codepoint lowering does not
    reproduce) — callers should catch RuntimeError and fall back."""

    def __init__(self, py_tok):
        if py_tok.lowercase:
            raise RuntimeError(
                "native unigram tokenizer requires lowercase=False")
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        pieces = list(py_tok.pieces.items())
        n = len(pieces)
        arr = (ctypes.c_char_p * n)(*[p.encode("utf-8") for p, _ in pieces])
        ids = (ctypes.c_int32 * n)(*[i for _, i in pieces])
        scores = (ctypes.c_double * n)(
            *[py_tok.scores.get(p, 0.0) for p, _ in pieces])
        byte_ids = (ctypes.c_int32 * 256)(
            *[py_tok.byte_ids.get(b, -1) for b in range(256)])
        self._handle = lib.uni_create(
            arr, ids, scores, n, byte_ids, py_tok.cls_id, py_tok.pad_id,
            py_tok.sep_id, py_tok.unk_id, py_tok.unk_penalty, 0)
        if not self._handle:
            raise RuntimeError("uni_create failed")
        # WordPiece-compatible surface for the pipeline dispatch
        self.cls_id = py_tok.cls_id
        self.pad_id = py_tok.pad_id
        self.sep_id = py_tok.sep_id

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.uni_destroy(self._handle)
            self._handle = None

    def encode(self, texts: Sequence[str], max_length: int,
               pad_to: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
        width = pad_to or max_length
        n = len(texts)
        ids = np.zeros((n, width), np.int32)
        mask = np.zeros((n, width), np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        rc = self._lib.uni_encode_batch(
            self._handle, arr, n, max_length, width,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise RuntimeError(f"uni_encode_batch failed: {rc}")
        return ids, mask
