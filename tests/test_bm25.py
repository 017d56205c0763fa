"""BM25 index + device scoring vs a pure-Python oracle (the rank_bm25-
parity strategy from SURVEY.md §4; rank_bm25 itself is not installed, so
the oracle implements the same Lucene-form Okapi formula)."""

import math

import numpy as np
import pytest

from intool_rag_tpu.index.analyzer import tokenize
from intool_rag_tpu.index.bm25_index import BM25Index, BM25Params

DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast auburn fox leaped across a sleepy canine",
    "Quantum computing uses qubits for superposition and entanglement",
    "The stock market saw record gains in technology shares today",
    "Foxes are wild canines found across the northern hemisphere",
    "Deep learning models require large amounts of training data",
    "发票金额总计人民币五千元整",
    "本发票由税务局监制 金额五千元",
    "Invoice total amount due is 5000 dollars payable immediately",
    "Das schnelle braune Fuchs springt über den faulen Hund",
]


def oracle_bm25(docs, query, k1=1.5, b=0.75):
    """Pure-python Lucene-form BM25 Okapi."""
    doc_terms = [tokenize(d) for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in doc_terms) / n
    df = {}
    for terms in doc_terms:
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    scores = np.zeros(n)
    qcounts = {}
    for t in tokenize(query):
        qcounts[t] = qcounts.get(t, 0) + 1
    for t, qtf in qcounts.items():
        if t not in df:
            continue
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for d, terms in enumerate(doc_terms):
            tf = terms.count(t)
            if tf == 0:
                continue
            w = tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(terms) / avgdl))
            scores[d] += qtf * idf * w
    return scores


# ---------------- analyzer ----------------


def test_tokenize_latin():
    assert tokenize("The Quick-Brown FOX!") == ["quick", "brown", "fox"]


def test_tokenize_stopwords_and_short():
    assert tokenize("it is a x 5 test") == ["5", "test"]


def test_tokenize_cjk_bigrams():
    toks = tokenize("发票金额")
    assert toks == ["发票", "票金", "金额"]


def test_tokenize_mixed():
    toks = tokenize("invoice发票2024")
    assert "invoice" in toks and "发票" in toks and "2024" in toks


def test_tokenize_nfkc():
    assert tokenize("ｆｕｌｌｗｉｄｔｈ") == ["fullwidth"]


# ---------------- index + device scoring ----------------


@pytest.mark.parametrize(
    "query",
    ["quick brown fox", "fox canine", "发票金额", "training data for models", "zzz unknown terms"],
)
def test_bm25_scores_match_oracle(query):
    idx = BM25Index.build(DOCS, BM25Params(p_max=16))
    got = np.asarray(idx.scores([query]))[0]
    want = oracle_bm25(DOCS, query)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bm25_topk_order():
    idx = BM25Index.build(DOCS, BM25Params(p_max=16))
    vals, ids = idx.topk(["fox"], k=3)
    want = oracle_bm25(DOCS, "fox")
    assert set(np.asarray(ids)[0].tolist()) == set(np.argsort(-want)[:3].tolist())


def test_bm25_batched_queries():
    idx = BM25Index.build(DOCS, BM25Params(p_max=16))
    got = np.asarray(idx.scores(["fox", "发票"]))
    np.testing.assert_allclose(got[0], oracle_bm25(DOCS, "fox"), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[1], oracle_bm25(DOCS, "发票"), rtol=1e-5, atol=1e-6)


def test_bm25_impact_pruning_keeps_strongest():
    # p_max=2: every term keeps only its 2 strongest postings
    idx = BM25Index.build(DOCS, BM25Params(p_max=2))
    got = np.asarray(idx.scores(["fox"]))[0]
    want = oracle_bm25(DOCS, "fox")
    top2 = np.argsort(-want)[:2]
    np.testing.assert_allclose(got[top2], want[top2], rtol=1e-5)
    assert np.count_nonzero(got) <= 2


def test_bm25_save_load_roundtrip(tmp_path):
    idx = BM25Index.build(DOCS)
    idx.save(tmp_path / "bm25")
    idx2 = BM25Index.load(tmp_path / "bm25")
    q = ["fox canine", "发票金额"]
    np.testing.assert_allclose(
        np.asarray(idx.scores(q)), np.asarray(idx2.scores(q)), rtol=1e-6
    )
