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
