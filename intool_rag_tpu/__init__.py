"""intool_rag_tpu — a TPU-native page-aware RAG framework.

A ground-up rebuild of the capability surface of ``batd-htplus/intool-rag``
(reference at /root/reference) designed TPU-first:

- The retrieval core (dense scoring, BM25 sparse scoring, hybrid fusion,
  reranking) runs as XLA programs over sharded device arrays, with Pallas
  kernels for the fused score+top-k hot path (reference delegates these to
  FAISS C++ / never implemented BM25 — see SURVEY.md §0).
- Embedding inference is a JAX transformer encoder (BGE-M3-class
  architecture), batched and bf16 on the MXU (reference:
  rag/providers/hf/embeddings.py delegates to sentence-transformers).
- Multi-chip scale-out uses ``jax.sharding.Mesh`` + ``shard_map`` with
  XLA collectives for distributed top-k merge and k-means IVF training
  (reference has no distributed execution at all — SURVEY.md §2.9).

The service surface mirrors the reference's five HTTP endpoints
(reference: rag/routers/page_aware_v2.py) and its ingest artifact quartet
(reference: rag/storage/file_storage.py), including the page-aware
grouping/ranking/citation semantics of rag/query/page_retriever.py.
"""

__version__ = "0.1.0"
