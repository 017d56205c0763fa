"""ctypes bindings for the native (C++) runtime components.

The shared library builds lazily on first use (g++ -O3) and is cached
next to the sources; everything degrades to the pure-Python paths when a
toolchain is unavailable (``native_available()`` reports which).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..logging import get_logger

logger = get_logger(__name__)


def _prefold(text: str) -> str:
    """NFKC + casefold the text exactly like the Python analyzer
    (index/analyzer.py tokenize) before handing it to C++.

    The native tokenizer only folds ASCII/Latin-1 case and fullwidth
    forms; uppercase Cyrillic/Greek, ligatures (ﬁ), and enclosed
    numerals would otherwise produce index terms that never match
    query-time terms. Pre-folding in Python makes the two token streams
    identical by construction — the C++ folds are idempotent no-ops on
    already-folded text.
    """
    from ..index.analyzer import fold

    return fold(text)


_SRC = Path(__file__).parent / "analyzer.cc"
_LIB = Path(__file__).parent / "libintool_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as exc:
        logger.warning("native analyzer build failed: %s", exc)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as exc:
            logger.warning("native analyzer load failed: %s", exc)
            _failed = True
            return None
        lib.build_corpus.restype = ctypes.c_void_p
        lib.build_corpus.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.corpus_sizes.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.corpus_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
        lib.free_corpus.argtypes = [ctypes.c_void_p]
        lib.tokenize_one.restype = ctypes.c_int64
        lib.tokenize_one.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def build_corpus_native(texts: list[str]):
    """Tokenize + count a corpus natively.

    Returns (vocab: list[str], df [V] i32, doc_indptr [n+1] i64,
    pair_terms [nnz] i32, pair_counts [nnz] i32, doc_len [n] i32)
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    blobs = [_prefold(t).encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    offsets[1:] = np.cumsum([len(b) for b in blobs])
    data = b"".join(blobs)
    handle = lib.build_corpus(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(blobs)
    )
    if not handle:
        return None
    try:
        sizes = np.zeros(4, np.int64)
        lib.corpus_sizes(handle, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        v, nnz, blob_bytes, n_docs = map(int, sizes)
        blob = ctypes.create_string_buffer(max(blob_bytes, 1))
        vocab_offsets = np.zeros(v + 1, np.int64)
        df = np.zeros(v, np.int32)
        doc_indptr = np.zeros(n_docs + 1, np.int64)
        pair_terms = np.zeros(max(nnz, 1), np.int32)
        pair_counts = np.zeros(max(nnz, 1), np.int32)
        doc_len = np.zeros(max(n_docs, 1), np.int32)
        lib.corpus_copy(
            handle,
            blob,
            vocab_offsets.ctypes.data_as(ctypes.c_void_p),
            df.ctypes.data_as(ctypes.c_void_p),
            doc_indptr.ctypes.data_as(ctypes.c_void_p),
            pair_terms.ctypes.data_as(ctypes.c_void_p),
            pair_counts.ctypes.data_as(ctypes.c_void_p),
            doc_len.ctypes.data_as(ctypes.c_void_p),
        )
        raw = blob.raw[:blob_bytes]
        vocab = [
            raw[vocab_offsets[i] : vocab_offsets[i + 1]].decode("utf-8")
            for i in range(v)
        ]
        return vocab, df, doc_indptr, pair_terms[:nnz], pair_counts[:nnz], doc_len[:n_docs]
    finally:
        lib.free_corpus(handle)


def tokenize_native(text: str) -> list[str] | None:
    lib = get_lib()
    if lib is None:
        return None
    data = _prefold(text).encode("utf-8")
    cap = max(len(data) * 8 + 64, 4096)
    out = ctypes.create_string_buffer(cap)
    written = ctypes.c_int64(0)
    count = lib.tokenize_one(data, len(data), out, cap, ctypes.byref(written))
    tokens = []
    pos = 0
    raw = out.raw
    for _ in range(count):
        tlen = raw[pos] | (raw[pos + 1] << 8)
        tokens.append(raw[pos + 2 : pos + 2 + tlen].decode("utf-8"))
        pos += 2 + tlen
    return tokens
