"""Evaluation harness tests: metric oracles + a constructed corpus where
hybrid must beat both single modes."""

import numpy as np
import pytest

from intool_rag_tpu.eval.harness import EvalExample, build_engine_from_texts, evaluate_engine
from intool_rag_tpu.eval.metrics import mrr, ndcg_at_k, recall_at_k
from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider


def test_metric_oracles():
    ranked = [3, 1, 7, 9]
    rel = {1, 9, 42}
    assert recall_at_k(ranked, rel, 4) == pytest.approx(2 / 3)
    assert recall_at_k(ranked, rel, 1) == 0.0
    assert mrr(ranked, rel) == pytest.approx(1 / 2)
    assert mrr([0, 0], {5}) == 0.0
    # NDCG: hits at ranks 2 and 4; ideal = ranks 1..3
    import math

    want = (1 / math.log2(3) + 1 / math.log2(5)) / (
        1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    )
    assert ndcg_at_k(ranked, rel, 4) == pytest.approx(want)
    assert ndcg_at_k([], rel, 5) == 0.0


def test_graded_ndcg_oracle():
    """Graded NDCG (linear gains): hand-computed DCG/IDCG, gains
    override the binary set, absent items gain 0."""
    import math

    gains = {1: 3.0, 9: 1.0, 42: 3.0}
    ranked = [3, 1, 7, 9]
    dcg = 3.0 / math.log2(3) + 1.0 / math.log2(5)
    ideal = 3.0 / math.log2(2) + 3.0 / math.log2(3) + 1.0 / math.log2(4)
    assert ndcg_at_k(ranked, {1, 42}, 4, gains=gains) == pytest.approx(
        dcg / ideal
    )
    # perfect graded order scores 1.0
    assert ndcg_at_k([1, 42, 9], {1, 42}, 3, gains=gains) == pytest.approx(
        1.0
    )
    assert ndcg_at_k([], {1}, 3, gains=gains) == 0.0


def test_graded_task_construction():
    """make_relevance_task_graded: grading invariants — gain-3 rows are
    exact (topic, ctx) matches, gain-1 rows are sibling-topic same-ctx,
    every doc mentions its topic word exactly once plus optional decoy,
    and the train split only pairs within-context."""
    from intool_rag_tpu.eval.synthetic import make_relevance_task_graded

    rng = np.random.default_rng(3)
    task = make_relevance_task_graded(rng, n_eval=16, n_train_queries=20)
    assert len(task.texts) == 32 * 24
    for ex in task.examples:
        qtop = int(ex.query.split()[0][4:])
        qctx = int(ex.query.split()[1][3:])
        assert ex.gains is not None
        for r, g in ex.gains.items():
            assert task.doc_ctx[r] == qctx
            if g == 3.0:
                assert task.doc_topic[r] == qtop
                assert r in ex.relevant_rows
            else:
                assert g == 1.0
                assert task.doc_topic[r] == (qtop ^ 1)
                assert r not in ex.relevant_rows
        # full-credit set == gain-3 set
        assert ex.relevant_rows == {
            r for r, g in ex.gains.items() if g == 3.0
        }
    # a saturating ranker cannot reach NDCG 1.0 by luck: sibling docs
    # exist in a reasonable share of examples
    with_sib = sum(
        any(g == 1.0 for g in ex.gains.values()) for ex in task.examples
    )
    assert with_sib >= 4, with_sib
    # docs: one topic mention (+ optional decoy), one ctx mention
    for text, t in zip(task.texts[:100], task.doc_topic[:100]):
        words = text.split()
        assert words.count(f"dtop{t}") == 1
        assert sum(w.startswith("ctx") for w in words) == 1


def test_hybrid_beats_single_modes(tmp_storage):
    """Corpus engineered so dense misses keyword matches and sparse misses
    paraphrases: hybrid must dominate both."""
    rng = np.random.default_rng(0)
    filler = [
        " ".join(rng.choice([f"noise{i}" for i in range(300)], size=20))
        for _ in range(200)
    ]
    # exact-keyword docs (sparse-friendly, lexically odd)
    kw = [f"zephyr{i} gadget manual section covers calibration" for i in range(5)]
    # paraphrase docs (dense/hash-friendly via shared character n-grams)
    para = [f"the warranty period lasting twenty four month guarantee {i}" for i in range(5)]
    texts = filler + kw + para
    provider = HashEmbeddingProvider(256)
    engine = build_engine_from_texts(texts, provider)

    examples = [
        EvalExample(f"zephyr{i} calibration", {200 + i}) for i in range(5)
    ] + [
        EvalExample("warranty period twenty four months guarantees", set(range(205, 210)))
    ]
    results = evaluate_engine(engine, provider, examples, k=10)
    assert results["hybrid"]["recall@k"] >= results["dense"]["recall@k"] - 1e-9
    assert results["hybrid"]["recall@k"] >= 0.8
    assert results["hybrid"]["mrr"] >= max(
        results["dense"]["mrr"], results["sparse"]["mrr"]
    ) - 0.15
    # all three modes produce well-formed averaged metrics
    for mode in ("dense", "sparse", "hybrid"):
        for metric, value in results[mode].items():
            assert 0.0 <= value <= 1.0, (mode, metric, value)
