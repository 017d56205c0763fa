"""Text analyzer for sparse (BM25) indexing — multilingual, CJK-aware.

The reference advertises multilingual/CJK keyword search (README.md:65)
but has no analyzer at all (BM25 was never implemented — SURVEY.md §0).
This one:

- lowercases + NFKC-normalizes,
- splits latin/cyrillic/etc. runs on non-word boundaries,
- splits CJK runs into overlapping bigrams (the standard CJK analyzer
  strategy; unigrams for isolated single characters),
- keeps numbers, drops a small English stopword set and 1-char latin
  tokens.

The same analyzer is used at build and query time, and by the pure-Python
oracle in tests, so recall parity is defined on identical token streams.
"""

from __future__ import annotations

import re
import unicodedata

_STOPWORDS = frozenset(
    """a an and are as at be but by for from has have if in into is it its of on
    or that the their then there these this to was were will with""".split()
)

# CJK unified ideographs, hiragana, katakana, hangul
_CJK_RANGES = (
    (0x3040, 0x30FF),
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0xAC00, 0xD7AF),
    (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF),
)

_TOKEN_RE = re.compile(r"[\w]+", re.UNICODE)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _split_mixed(token: str) -> list[str]:
    """Split a \\w+ token into latin/digit runs and CJK runs; CJK runs
    become bigrams."""
    out: list[str] = []
    run = []
    run_cjk = False

    def flush() -> None:
        if not run:
            return
        s = "".join(run)
        if run_cjk:
            if len(s) == 1:
                out.append(s)
            else:
                out.extend(s[i : i + 2] for i in range(len(s) - 1))
        else:
            if len(s) > 1 and s not in _STOPWORDS:
                out.append(s)
            elif s.isdigit():
                out.append(s)
        run.clear()

    for ch in token:
        cjk = _is_cjk(ch)
        if run and cjk != run_cjk:
            flush()
        run.append(ch)
        run_cjk = cjk
    flush()
    return out


def fold(text: str) -> str:
    """Case/compatibility folding shared by the Python and native
    tokenizers: NFKC, lowercase, then strip combining marks that survive
    recomposition (e.g. U+0307 from lowering İ). Python's ``\\w`` and the
    C++ tokenizer classify combining marks differently, so leaving them
    in splits tokens inconsistently between the two."""
    text = unicodedata.normalize("NFKC", text).lower()
    if not text.isascii():
        text = "".join(ch for ch in text if not unicodedata.combining(ch))
    return text


_native_tok = None
_native_checked = False


def tokenize(text: str) -> list[str]:
    """Analyze text into BM25 terms.

    Routes through the native C++ analyzer when built (bit-identical
    token stream — parity pinned in tests/test_native.py). The Python
    path spends ~75 % of its time in per-character CJK classification
    (`_split_mixed`), which profiled as the single largest cost of the
    whole ingest pipeline (round 5: 2.1 s of a 6 s 20-doc run through
    the hash embedder's feature extraction)."""
    global _native_tok, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from ..native import tokenize_native

            if tokenize_native("probe 探针 text") is not None:
                _native_tok = tokenize_native
        except Exception:
            _native_tok = None
    if _native_tok is not None:
        terms = _native_tok(text)
        if terms is not None:
            return terms
    return tokenize_py(text)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python analyzer (the parity reference for the native path)."""
    text = fold(text)
    terms: list[str] = []
    for token in _TOKEN_RE.findall(text):
        terms.extend(_split_mixed(token))
    return terms
