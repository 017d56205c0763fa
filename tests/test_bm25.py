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
    # compare the positive-score hits (zero-score slots carry arbitrary ids)
    got = {int(i) for i, v in zip(np.asarray(ids)[0], np.asarray(vals)[0]) if v > 0}
    expect = {int(i) for i in np.argsort(-want)[:3] if want[i] > 0}
    assert got == expect


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


def test_bm25_sorted_kernel_matches_scatter():
    """The scatter-free sorted-aggregation kernel must agree with the
    scatter kernel (up to f32 summation order)."""
    import jax.numpy as jnp

    from intool_rag_tpu.ops.bm25 import bm25_topk, bm25_topk_sorted

    idx = BM25Index.build(DOCS * 3, BM25Params(p_max=16))
    queries = ["fox canine", "发票金额", "training data", "zzz"]
    qt, qf = idx.encode_queries(queries)
    args = (qt, qf, idx.term_start, idx.term_len, idx.post_docs, idx.post_w, idx.idf)
    v1, i1 = bm25_topk(*args, 8, n_docs=idx.n_docs, p_max=16)
    v2, i2 = bm25_topk_sorted(*args, 8, n_docs=idx.n_docs, p_max=16)
    for r in range(len(queries)):
        got1 = {int(i): float(v) for i, v in zip(np.asarray(i1)[r], np.asarray(v1)[r]) if v > 0}
        got2 = {int(i): float(v) for i, v in zip(np.asarray(i2)[r], np.asarray(v2)[r]) if v > 0}
        assert got1.keys() == got2.keys()
        for doc in got1:
            assert got1[doc] == pytest.approx(got2[doc], rel=1e-4)


def test_bm25_sorted_kernel_negative_contributions():
    """Regression: a negative idf (corrupted input) must degrade
    gracefully — both kernels clamp contributions at 0 (the cummax
    segmented sum requires ≥ 0; unclamped negatives silently corrupted
    unrelated totals)."""
    import jax.numpy as jnp

    from intool_rag_tpu.ops.bm25 import bm25_topk, bm25_topk_sorted

    n_docs, p_max, v = 20, 8, 3
    # hand-built postings with a NEGATIVE idf term
    term_start = jnp.asarray([0, 8, 16], jnp.int32)
    term_len = jnp.asarray([5, 4, 2], jnp.int32)
    post_docs = jnp.asarray(
        [1, 3, 5, 7, 9, n_docs, n_docs, n_docs,
         1, 2, 3, 4, n_docs, n_docs, n_docs, n_docs,
         5, 6, n_docs, n_docs, n_docs, n_docs, n_docs, n_docs,
         n_docs] * 1 + [n_docs] * 7, jnp.int32)
    post_w = jnp.asarray(
        [1.0, 0.9, 0.8, 0.7, 0.6, 0, 0, 0,
         1.2, 1.1, 1.0, 0.9, 0, 0, 0, 0,
         0.5, 0.4, 0, 0, 0, 0, 0, 0] + [0.0] * 8, jnp.float32)
    idf = jnp.asarray([-0.5, 2.0, 3.0], jnp.float32)  # term 0 negative
    qterms = jnp.asarray([[0, 1, 2, -1]], jnp.int32)
    qtf = jnp.asarray([[1.0, 1.0, 1.0, 0.0]], jnp.float32)
    args = (qterms, qtf, term_start, term_len, post_docs, post_w, idf)
    v1, i1 = bm25_topk(*args, 6, n_docs=n_docs, p_max=p_max)
    v2, i2 = bm25_topk_sorted(*args, 6, n_docs=n_docs, p_max=p_max)
    got1 = {int(i): float(v) for i, v in zip(np.asarray(i1)[0], np.asarray(v1)[0]) if v > 0}
    got2 = {int(i): float(v) for i, v in zip(np.asarray(i2)[0], np.asarray(v2)[0]) if v > 0}
    assert got1.keys() == got2.keys()
    for d in got1:
        assert got1[d] == pytest.approx(got2[d], rel=1e-5)


def test_bm25_incremental_append_matches_full_rebuild():
    """append(new_texts) must equal a from-scratch build over the union
    (idf/avgdl recompute exactly; only new texts are tokenized)."""
    base, extra = DOCS[:6], DOCS[6:]
    idx = BM25Index.build(base, BM25Params(p_max=16))
    appended = idx.append(extra)
    full = BM25Index.build(DOCS, BM25Params(p_max=16))
    assert appended.vocab == full.vocab
    assert appended.n_docs == full.n_docs
    assert appended.avgdl == pytest.approx(full.avgdl)
    queries = ["fox canine", "发票金额", "training data"]
    np.testing.assert_allclose(
        np.asarray(appended.scores(queries)),
        np.asarray(full.scores(queries)),
        rtol=1e-6,
    )
    # the original index is untouched
    assert idx.n_docs == 6
    # chained append works too
    chained = BM25Index.build(DOCS[:3], BM25Params(p_max=16)).append(DOCS[3:6]).append(extra)
    np.testing.assert_allclose(
        np.asarray(chained.scores(queries)), np.asarray(full.scores(queries)), rtol=1e-6
    )


def test_bm25_save_load_roundtrip(tmp_path):
    idx = BM25Index.build(DOCS)
    idx.save(tmp_path / "bm25")
    idx2 = BM25Index.load(tmp_path / "bm25")
    q = ["fox canine", "发票金额"]
    np.testing.assert_allclose(
        np.asarray(idx.scores(q)), np.asarray(idx2.scores(q)), rtol=1e-6
    )


def test_bm25_rows_kernel_matches_sorted():
    """The two-tier row-layout kernel must agree exactly (up to f32 sum
    order) with the 1-D sorted kernel — same contributions, different
    gather layout."""
    from intool_rag_tpu.ops.bm25 import bm25_topk_rows, bm25_topk_sorted

    idx = BM25Index.build(DOCS * 3, BM25Params(p_max=16))
    queries = ["fox canine", "发票金额", "training data", "zzz"]
    qt, qf = idx.encode_queries(queries)
    v1, i1 = bm25_topk_sorted(
        qt, qf, idx.term_start, idx.term_len, idx.post_docs, idx.post_w,
        idx.idf, 8, n_docs=idx.n_docs, p_max=16,
    )
    rows = idx._row_layout()
    v2, i2 = bm25_topk_rows(
        qt, qf, rows["term_row"], rows["term_hot"],
        rows["hot_docs"], rows["hot_w"], rows["cold_docs"], rows["cold_w"],
        idx.idf, 8, n_docs=idx.n_docs,
    )
    for r in range(len(queries)):
        got1 = {int(i): float(v) for i, v in zip(np.asarray(i1)[r], np.asarray(v1)[r]) if v > 0}
        got2 = {int(i): float(v) for i, v in zip(np.asarray(i2)[r], np.asarray(v2)[r]) if v > 0}
        assert got1.keys() == got2.keys()
        for doc in got1:
            assert got1[doc] == pytest.approx(got2[doc], rel=1e-4)


def test_bm25_rows_packed_matches_rows():
    """rows_packed (single-i32-key sort) must rank like the exact rows
    kernel; scores agree within the documented ≤ T·cmax/2^12 quantization
    bound (~1e-3 relative)."""
    from intool_rag_tpu.ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed

    idx = BM25Index.build(DOCS * 5, BM25Params(p_max=16))
    queries = ["fox canine dog", "发票金额", "invoice total amount", "zzz"]
    qt, qf = idx.encode_queries(queries)
    rows = idx._row_layout()
    args = (
        qt, qf, rows["term_row"], rows["term_hot"],
        rows["hot_docs"], rows["hot_w"], rows["cold_docs"], rows["cold_w"],
        idx.idf, 10,
    )
    v1, i1 = bm25_topk_rows(*args, n_docs=idx.n_docs)
    v2, i2 = bm25_topk_rows_packed(*args, n_docs=idx.n_docs)
    # and with the shard-independent term_wmax quantization grid (the
    # production BM25Index.topk path; bound is ~2x looser than cmax)
    v3, i3 = bm25_topk_rows_packed(
        *args, n_docs=idx.n_docs, term_wmax=rows["term_wmax"]
    )
    np.testing.assert_allclose(
        np.asarray(v3), np.asarray(v1), rtol=4e-3, atol=2e-3
    )
    for r in range(len(queries)):
        got1 = {int(i): float(v) for i, v in zip(np.asarray(i1)[r], np.asarray(v1)[r]) if v > 0}
        got2 = {int(i): float(v) for i, v in zip(np.asarray(i2)[r], np.asarray(v2)[r]) if v > 0}
        # same candidate set (quantization can only flip near-ties, and
        # this corpus has none within 1e-3 relative)
        assert got1.keys() == got2.keys()
        for doc in got1:
            assert got2[doc] == pytest.approx(got1[doc], rel=2e-3, abs=1e-3)


def test_bm25_rows_packed_overflow_guard():
    """n_docs beyond the packed-key range must raise, and BM25Index.topk
    must keep working via the exact rows fallback (simulated by calling
    the kernel contract directly)."""
    import jax.numpy as jnp

    from intool_rag_tpu.ops.bm25 import bm25_topk_rows_packed

    with pytest.raises(ValueError, match="overflows"):
        bm25_topk_rows_packed(
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.float32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.float32),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.float32),
            jnp.zeros((1,), jnp.float32), 1, n_docs=1 << 20,
        )


def test_bm25_index_topk_matches_scores_oracle():
    """BM25Index.topk (rows_packed fast path) must return the same top
    docs as argsort over the exact dense score matrix."""
    idx = BM25Index.build(DOCS * 4, BM25Params(p_max=16))
    queries = ["fox canine", "invoice amount due", "quantum qubits"]
    dense = np.asarray(idx.scores(queries))
    vals, ids = idx.topk(queries, 5)
    vals, ids = np.asarray(vals), np.asarray(ids)
    for r in range(len(queries)):
        want = {d for d in np.argsort(-dense[r])[:5] if dense[r][d] > 0}
        got = {int(i) for i, v in zip(ids[r], vals[r]) if v > 0}
        # ties at the cut can differ; require the positive-score sets to
        # agree on the clearly-ranked prefix
        assert len(got & want) >= min(len(want), 4)
        for i, v in zip(ids[r], vals[r]):
            if v > 0:
                assert dense[r][int(i)] == pytest.approx(float(v), rel=2e-3, abs=1e-3)


def test_bm25_packed_keeps_tiny_contributions():
    """Regression (review finding): a query mixing one dominant rare
    term with a near-stopword must NOT drop the common-term-only
    candidates — contributions under half a quantization step floor at
    level 1 instead of vanishing to a (0.0, masked) no-match."""
    docs = ["unicorn stopword stopword"] + ["stopword filler"] * 30
    idx = BM25Index.build(docs, BM25Params(p_max=64))
    from intool_rag_tpu.ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed

    qt, qf = idx.encode_queries(["unicorn stopword"])
    rows = idx._row_layout()
    args = (
        qt, qf, rows["term_row"], rows["term_hot"],
        rows["hot_docs"], rows["hot_w"], rows["cold_docs"], rows["cold_w"],
        idx.idf, 10,
    )
    v1, i1 = bm25_topk_rows(*args, n_docs=idx.n_docs)
    v2, i2 = bm25_topk_rows_packed(
        *args, n_docs=idx.n_docs, term_wmax=rows["term_wmax"]
    )
    n_exact = int((np.asarray(v1)[0] > 0).sum())
    n_packed = int((np.asarray(v2)[0] > 0).sum())
    assert n_packed == n_exact, (n_packed, n_exact)
    # the rare-term doc still ranks first
    assert np.asarray(i2)[0, 0] == np.asarray(i1)[0, 0] == 0


def test_bm25_hot_first_packing_parity():
    """hot_cap packing (hot terms sorted first, wide gather over T/2
    slots) must match the full-width kernel exactly; queries with more
    hot terms than the cap fall back inside BM25Index.topk."""
    import jax.numpy as jnp

    from intool_rag_tpu.ops.bm25 import bm25_topk_rows_packed

    # 40 docs sharing common words (hot at cold_width 4) + rare terms
    common = "alpha beta gamma delta"
    docs = [f"{common} rare{i} extra{i % 7}" for i in range(40)]
    idx = BM25Index.build(docs, BM25Params(p_max=16))
    rows = idx._row_layout(cold_width=4)
    queries = ["alpha rare3", "beta gamma extra2", "rare7 rare8"]
    qt, qf = idx.encode_queries(queries, max_terms=8)
    qt_np, qf_np = np.asarray(qt), np.asarray(qf)
    hot_np = rows["term_hot_np"]
    is_hot = (qt_np >= 0) & hot_np[np.maximum(qt_np, 0)]
    order = np.argsort(~is_hot, axis=1, kind="stable")
    qt_s = jnp.asarray(np.take_along_axis(qt_np, order, 1))
    qf_s = jnp.asarray(np.take_along_axis(qf_np, order, 1))
    args_tail = (
        rows["term_row"], rows["term_hot"], rows["hot_docs"],
        rows["hot_w"], rows["cold_docs"], rows["cold_w"], idx.idf, 10,
    )
    v_full, i_full = bm25_topk_rows_packed(
        qt, qf, *args_tail, n_docs=idx.n_docs,
        term_wmax=rows["term_wmax"],
    )
    v_cap, i_cap = bm25_topk_rows_packed(
        qt_s, qf_s, *args_tail, n_docs=idx.n_docs,
        term_wmax=rows["term_wmax"], hot_cap=4,
    )
    for r in range(len(queries)):
        got_f = {int(i): float(v) for i, v in zip(np.asarray(i_full)[r], np.asarray(v_full)[r]) if v > 0}
        got_c = {int(i): float(v) for i, v in zip(np.asarray(i_cap)[r], np.asarray(v_cap)[r]) if v > 0}
        assert got_f.keys() == got_c.keys()
        for d in got_f:
            assert got_c[d] == pytest.approx(got_f[d], rel=1e-5)
    # BM25Index.topk end-to-end (packs internally) matches the dense oracle
    dense = np.asarray(idx.scores(queries))
    vals, ids = idx.topk(queries, 5)
    for r in range(len(queries)):
        for i, v in zip(np.asarray(ids)[r], np.asarray(vals)[r]):
            if v > 0:
                assert dense[r][int(i)] == pytest.approx(
                    float(v), rel=2e-3, abs=1e-3
                )


def test_bm25_rows_packed_rescore_exact_scores():
    """With the exact pool rescore (default), packed candidate SCORES
    must match the exact rows kernel bit-for-bit modulo f32 sum order —
    quantization only survives at the selection boundary (round 3c:
    quantized-total ordering alone measured recall@10 0.952 vs exact at
    1M/p_max 512; the rescore restores the pruning-limited 0.994)."""
    from intool_rag_tpu.ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed

    idx = BM25Index.build(DOCS * 5, BM25Params(p_max=16))
    queries = ["fox canine dog", "发票金额", "invoice total amount"]
    qt, qf = idx.encode_queries(queries)
    rows = idx._row_layout()
    args = (
        qt, qf, rows["term_row"], rows["term_hot"],
        rows["hot_docs"], rows["hot_w"], rows["cold_docs"], rows["cold_w"],
        idx.idf, 10,
    )
    v1, i1 = bm25_topk_rows(*args, n_docs=idx.n_docs)
    v2, i2 = bm25_topk_rows_packed(
        *args, n_docs=idx.n_docs, term_wmax=rows["term_wmax"], rescore=True
    )
    for r in range(len(queries)):
        exact = {int(i): float(v) for i, v in zip(np.asarray(i1)[r], np.asarray(v1)[r]) if v > 0}
        got = {int(i): float(v) for i, v in zip(np.asarray(i2)[r], np.asarray(v2)[r]) if v > 0}
        assert got.keys() == exact.keys()
        for doc, v in got.items():
            assert v == pytest.approx(exact[doc], rel=1e-6)
    # rescore=False keeps the quantized totals (the sharded bit-parity path)
    v3, _ = bm25_topk_rows_packed(
        *args, n_docs=idx.n_docs, term_wmax=rows["term_wmax"], rescore=False
    )
    assert not np.allclose(np.asarray(v3), np.asarray(v2), rtol=1e-7, atol=0)
