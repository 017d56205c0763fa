"""Device kernels: dense scoring/top-k, sparse BM25, fusion, k-means.

These replace the reference's C++ delegations (FAISS `IndexFlatL2` search —
reference: rag/storage/faiss_index.py:63-128 — and the never-implemented
BM25/rerank capabilities) with XLA/Pallas programs.
"""

from .topk import flat_topk, merge_topk  # noqa: F401
