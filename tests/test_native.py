"""Native C++ analyzer: token-stream and index parity vs the Python
reference implementation."""

import numpy as np
import pytest

# the PURE-PYTHON reference: analyzer.tokenize itself now routes
# through the native path (round 5), which would make the parity
# checks below vacuous
from intool_rag_tpu.index.analyzer import tokenize_py as py_tokenize
from intool_rag_tpu.native import (
    build_corpus_native,
    native_available,
    tokenize_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

CASES = [
    "The Quick-Brown FOX jumps!",
    "发票金额总计人民币五千元整",
    "invoice发票2024 with mixed内容 and numbers 42",
    "ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ",
    "it is a the and x y 5 test",
    "Müller straße ÀÉÎÕÜ",
    "",
    "!!!",
    "a" * 300,
    # Folding beyond ASCII/Latin-1: uppercase Cyrillic/Greek, ligatures,
    # enclosed numerals — these diverged before text was pre-folded in
    # Python (ADVICE.md round 1, native/__init__.py _prefold).
    "МОСКВА Москва москва",
    "ΑΘΗΝΑ Αθήνα αθήνα ΣΟΦΙΑ",
    "ﬁle ﬂow ﬃ ligatures oﬃce",
    "numbers ① ② ⑩ circled and Ⅷ roman",
    "İstanbul STRASSE ß",
]


@pytest.mark.parametrize("text", CASES)
def test_tokenize_parity(text):
    assert tokenize_native(text) == py_tokenize(text)


def test_corpus_build_matches_python_counting():
    texts = CASES + ["shared shared shared tokens here", "shared tokens"]
    result = build_corpus_native(texts)
    assert result is not None
    vocab, df, doc_indptr, pair_terms, pair_counts, doc_len = result
    assert vocab == sorted(vocab)
    # per-doc counting parity
    for d, text in enumerate(texts):
        want: dict[str, int] = {}
        for t in py_tokenize(text):
            want[t] = want.get(t, 0) + 1
        got = {
            vocab[pair_terms[j]]: int(pair_counts[j])
            for j in range(doc_indptr[d], doc_indptr[d + 1])
        }
        assert got == want, f"doc {d}"
        assert doc_len[d] == len(py_tokenize(text))
    # df parity
    df_want = {}
    for text in texts:
        for t in set(py_tokenize(text)):
            df_want[t] = df_want.get(t, 0) + 1
    assert {vocab[i]: int(df[i]) for i in range(len(vocab))} == df_want


def test_index_parity_native_vs_python(monkeypatch):
    from intool_rag_tpu.index.bm25_index import BM25Index

    texts = [
        "the quick brown fox", "invoice total 发票金额", "deep learning models",
        "fox habitat in the north", "another fox document entirely",
    ]
    idx_native = BM25Index.build(texts)
    import intool_rag_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "build_corpus_native", lambda t: None)
    idx_py = BM25Index.build(texts)
    assert idx_native.vocab == idx_py.vocab
    q = ["fox invoice 发票"]
    np.testing.assert_allclose(
        np.asarray(idx_native.scores(q)), np.asarray(idx_py.scores(q)), rtol=1e-6
    )
