"""Evaluation harness over a HybridEngine: run queries with known
relevance judgments, report Recall@K / MRR / NDCG per retrieval mode
(dense-only, sparse-only, hybrid) so fusion gains are measurable."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..index.bm25_index import BM25Index
from ..index.chunk_store import ChunkStore
from ..index.hybrid import HybridEngine
from .metrics import mrr, ndcg_at_k, recall_at_k


@dataclasses.dataclass
class EvalExample:
    query: str
    relevant_rows: set  # corpus row indices judged relevant


def evaluate_engine(
    engine: HybridEngine,
    provider,
    examples: list[EvalExample],
    *,
    k: int = 10,
    modes: tuple[str, ...] = ("dense", "sparse", "hybrid"),
) -> dict[str, dict[str, float]]:
    """Returns mode → {recall@k, mrr, ndcg@k} averaged over examples."""
    queries = [e.query for e in examples]
    emb = jnp.asarray(provider.embed_batch(queries, is_query=True))
    results: dict[str, dict[str, float]] = {}
    for mode in modes:
        if mode == "dense":
            _, rows = engine.search(queries, emb, k, hybrid=False)
            ranked_lists = np.asarray(rows)
        elif mode == "sparse":
            assert engine.bm25 is not None
            vals, rows = engine.bm25.topk(queries, k)
            rows = jnp.where(vals > 0, rows, -1)
            ranked_lists = np.asarray(rows)
        else:
            _, rows = engine.search(queries, emb, k, hybrid=True)
            ranked_lists = np.asarray(rows)
        agg = {"recall@k": 0.0, "mrr": 0.0, "ndcg@k": 0.0}
        for example, ranked in zip(examples, ranked_lists):
            ranked = [int(r) for r in ranked if r >= 0]
            agg["recall@k"] += recall_at_k(ranked, example.relevant_rows, k)
            agg["mrr"] += mrr(ranked, example.relevant_rows)
            agg["ndcg@k"] += ndcg_at_k(ranked, example.relevant_rows, k)
        n = max(len(examples), 1)
        results[mode] = {name: round(v / n, 4) for name, v in agg.items()}
    return results


def build_engine_from_texts(
    texts: list[str], provider, *, dtype: str = "float32"
) -> HybridEngine:
    """Convenience: embed + index a text corpus into a HybridEngine."""
    emb = provider.embed_batch(texts)
    store = ChunkStore(dim=emb.shape[1], dtype=dtype)
    store.append(
        np.asarray(emb, np.float32),
        doc_id="eval",
        chunk_ids=[f"c_{i:06d}" for i in range(len(texts))],
        pages=[0] * len(texts),
        texts=texts,
    )
    return HybridEngine(store, BM25Index.build(texts))
