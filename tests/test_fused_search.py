"""Fused one-launch hybrid search ≡ the staged path.

Round 5 collapsed the serving pipeline (flat dense + BM25 + sanitize +
fusion) into one jitted program (`index/hybrid._fused_hybrid_search`)
because the staged path cost ~10 device dispatches per search (~2 s on
the TPU tunnel). The fused program and the staged path share their
branch selection (flat_plan/topk_plan) but are separate call graphs —
this test pins their equivalence across fusion modes, hybrid on/off,
and query-count bucketing, against the SAME corpus.

Reference contract: rag/storage/faiss_index.py:87 (score space) +
SURVEY §3.2 (one-XLA-program query path).
"""

import numpy as np
import pytest

from intool_rag_tpu import config as config_mod
from intool_rag_tpu.index.bm25_index import BM25Index
from intool_rag_tpu.index.chunk_store import ChunkStore
from intool_rag_tpu.index.hybrid import HybridEngine


def _corpus(rng, n=600, dim=64):
    words = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(n)]
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = ChunkStore(dim=dim, dtype="bfloat16")
    store.append(
        emb, doc_id="d", chunk_ids=[f"c{i}" for i in range(n)],
        pages=[0] * n, texts=texts,
    )
    return texts, emb, store


@pytest.mark.parametrize("fusion_mode", ["weighted", "rrf"])
def test_fused_matches_staged(monkeypatch, fusion_mode):
    import jax.numpy as jnp

    monkeypatch.setenv("FUSION_MODE", fusion_mode)
    config_mod.reset_config()
    rng = np.random.default_rng(3)
    texts, emb, store = _corpus(rng)
    engine = HybridEngine(store, BM25Index.build(texts))

    queries = [" ".join(t.split()[:4]) for t in texts[:5]]
    q_emb = jnp.asarray(emb[:5])

    fused_v, fused_r = engine.search(queries, q_emb, 10)

    # staged: force the non-fused path by disabling hybrid fusion's
    # fused precondition — call the pieces the way the pre-round-5
    # engine did
    from intool_rag_tpu.config import get_config
    from intool_rag_tpu.ops.fusion import (
        normalize_minmax,
        rrf_fusion,
        weighted_fusion,
    )

    cfg = get_config()
    kc = max(10, cfg.RETRIEVAL_CANDIDATES)
    kc = min(kc, store.valid_n)
    d_vals, d_rows = engine.dense.search(q_emb, kc)
    d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
    s_vals, s_rows = engine.bm25.topk(queries, kc)
    s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
    if fusion_mode == "rrf":
        exp_v, exp_r = rrf_fusion(d_rows, s_rows, 10, rrf_k=cfg.RRF_K)
    else:
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        exp_v, exp_r = weighted_fusion(
            d_rows, d_vals, s_rows, s_norm, 10,
            w_dense=cfg.VECTOR_WEIGHT, w_sparse=cfg.BM25_WEIGHT,
        )

    np.testing.assert_array_equal(np.asarray(fused_r), np.asarray(exp_r))
    np.testing.assert_allclose(
        np.asarray(fused_v), np.asarray(exp_v), rtol=1e-5, atol=1e-6
    )
    config_mod.reset_config()


def test_fused_dense_only_and_bucketing(monkeypatch):
    """hybrid=False skips the fused program; query-count bucketing in
    registry.search returns identical hits for a batch served padded
    (Q=3 → bucket 4) vs queried one at a time."""
    import jax.numpy as jnp

    config_mod.reset_config()
    rng = np.random.default_rng(4)
    texts, emb, store = _corpus(rng)
    engine = HybridEngine(store, BM25Index.build(texts))
    queries = [" ".join(t.split()[:4]) for t in texts[:3]]
    q_emb = jnp.asarray(emb[:3])

    v_h, r_h = engine.search(queries, q_emb, 5, hybrid=False)
    v_d, r_d = engine.dense.search(q_emb, max(5, 50))
    np.testing.assert_array_equal(
        np.asarray(r_h), np.asarray(jnp.where(
            jnp.isfinite(v_d), r_d, -1))[:, :5],
    )

    # registry-level bucketing parity
    from intool_rag_tpu.index.registry import CorpusRegistry

    reg = CorpusRegistry.__new__(CorpusRegistry)
    import threading

    reg._lock = threading.Lock()
    reg.engine, reg.store = engine, store
    reg.doc_projects = {"d": "p"}
    batch_hits = reg.search(queries, q_emb, 5)
    for i, q in enumerate(queries):
        solo = reg.search([q], q_emb[i : i + 1], 5)[0]
        assert [h["chunk_id"] for h in solo] == [
            h["chunk_id"] for h in batch_hits[i]
        ]


def test_batched_retrieval_reranks_like_single_path(monkeypatch, tmp_path):
    """Round-5 review finding: routing /search through the micro-batcher
    dropped cross-encoder reranking because retrieve_chunks_batch had no
    reranker path. Both paths must apply the same rerank contract
    (RERANKER_CANDIDATES over-fetch + sigmoid(rerank logits) scores)."""
    monkeypatch.setenv("STORAGE_DIR", str(tmp_path))
    monkeypatch.setenv("RERANKER_ENABLED", "true")
    config_mod.reset_config()
    import jax.numpy as jnp

    from intool_rag_tpu.index.registry import CorpusRegistry
    from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
    from intool_rag_tpu.query.retriever import PageLevelRetriever

    class StubReranker:
        """Deterministic: score = passage length (longer = better)."""

        def rerank(self, query, candidates, top_k):
            out = []
            for c in candidates:
                h = dict(c)
                h["rerank_score"] = float(len(c["text"]))
                out.append(h)
            out.sort(key=lambda h: -h["rerank_score"])
            return out[:top_k]

    rng = np.random.default_rng(7)
    texts, emb, store = _corpus(rng, n=300)
    registry = CorpusRegistry.__new__(CorpusRegistry)
    import threading

    registry._lock = threading.Lock()
    from intool_rag_tpu.index.bm25_index import BM25Index
    from intool_rag_tpu.index.hybrid import HybridEngine

    registry.engine = HybridEngine(store, BM25Index.build(texts))
    registry.store = store
    registry.doc_projects = {"d": None}
    provider = HashEmbeddingProvider(64)
    # the stub ignores embeddings; make provider dims match the corpus
    retriever = PageLevelRetriever(
        registry=registry, provider=provider, reranker=StubReranker()
    )

    queries = [" ".join(t.split()[:4]) for t in texts[:3]]
    batch = retriever.retrieve_chunks_batch(queries, [None] * 3)
    for q, chunks in zip(queries, batch):
        single = retriever.retrieve_chunks(q)
        assert [c.chunk_id for c in chunks] == [c.chunk_id for c in single]
        # sigmoid(rerank logits) score space, descending by length
        lens = [len(c.text) for c in chunks]
        assert lens == sorted(lens, reverse=True)
        assert all(0.0 <= c.score <= 1.0 for c in chunks)
    config_mod.reset_config()
