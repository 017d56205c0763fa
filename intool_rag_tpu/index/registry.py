"""Corpus registry: all documents merged into one searchable device corpus.

Replaces the reference's module-level FAISS index cache + startup preload
(rag/storage/faiss_index.py:24,202-228) — and fixes its bug of searching
only the first index found (faiss_index.py:162-167): here every ingested
document's vectors live in one global ChunkStore, so queries span the
whole corpus, with optional per-project filtering applied to results.
"""

from __future__ import annotations

import threading
from pathlib import Path

import numpy as np

from ..config import get_config
from ..logging import get_logger
from .bm25_index import BM25Index
from .chunk_store import ChunkStore
from .hybrid import HybridEngine

logger = get_logger(__name__)


class CorpusRegistry:
    """Owns the global ChunkStore + BM25 index + HybridEngine, kept in
    sync with the on-disk artifact quartets."""

    def __init__(self, storage_dir: Path | str | None = None) -> None:
        from ..storage.artifacts import FileStorageManager

        self.storage = FileStorageManager(storage_dir)
        self.store: ChunkStore | None = None
        self.bm25: BM25Index | None = None
        self.engine: HybridEngine | None = None
        self.doc_projects: dict[str, str] = {}
        self.page_indexes: dict = {}  # doc_id -> PageIndex (citation lookup)
        self.chunk_nodes: dict[tuple[str, str], str] = {}  # (doc, chunk) -> node
        self.version = 0  # bumped on every corpus mutation (cache invalidation)
        self._lock = threading.Lock()

    # ---------------- load ----------------

    def load_all(self) -> int:
        """Startup preload: merge every stored document into the corpus
        (reference: initialize_storage, faiss_index.py:202-228)."""
        with self._lock:
            self.store = None
            self.bm25 = None
            self.engine = None
            self.doc_projects = {}
            self.page_indexes = {}
            self.chunk_nodes = {}
            count = 0
            for doc_id in self.storage.list_documents():
                try:
                    self._add_doc_locked(doc_id)
                    count += 1
                except Exception as exc:  # degrade per-doc, keep serving
                    logger.error("failed to load document %s: %s", doc_id, exc)
            self._rebuild_bm25_locked()
            logger.info("corpus loaded: %d documents, %d chunks",
                        count, len(self.store) if self.store else 0)
            return count

    def _add_doc_locked(self, doc_id: str) -> list[str]:
        embeddings, meta = self.storage.load_vectors(doc_id)
        chunks = self.storage.load_chunks(doc_id)
        page_index = self.storage.load_page_index(doc_id)
        self.doc_projects[doc_id] = page_index.project
        self.page_indexes[doc_id] = page_index
        for c in chunks:
            self.chunk_nodes[(doc_id, c.chunk_id)] = c.node_id
        texts_by_id = {c.chunk_id: c.text for c in chunks}
        texts = [texts_by_id.get(cid, "") for cid in meta.chunk_ids]
        if self.store is None:
            cfg = get_config()
            self.store = ChunkStore(dim=embeddings.shape[1], dtype=cfg.INDEX_DTYPE)
        self.store.append(
            np.asarray(embeddings, np.float32),
            doc_id=doc_id,
            chunk_ids=list(meta.chunk_ids),
            pages=list(meta.pages),
            texts=texts,
        )
        return texts

    def _rebuild_bm25_locked(self) -> None:
        if self.store is None or len(self.store) == 0:
            self.bm25 = None
            self.engine = None
            return
        self.bm25 = BM25Index.build(self.store.texts)
        self.engine = HybridEngine(self.store, self.bm25)

    # ---------------- mutation ----------------

    def add_document(self, doc_id: str) -> int:
        """Load one (already persisted) document into the live corpus.
        The BM25 index extends incrementally — only the new document's
        texts are tokenized (a full corpus re-tokenization per ingest
        would be O(corpus))."""
        with self._lock:
            texts = self._add_doc_locked(doc_id)
            if self.bm25 is not None and getattr(self.bm25, "_counted", None) is not None:
                self.bm25 = self.bm25.append(texts)
                # same store object → carry the dense index over so its
                # derived state (IVF partition, streaming segments)
                # appends incrementally instead of rebuilding per ingest
                self.engine = HybridEngine(
                    self.store, self.bm25,
                    dense=self.engine.dense if self.engine else None,
                )
            else:
                self._rebuild_bm25_locked()
            self.version += 1
            return len(texts)

    def remove_document(self, doc_id: str) -> bool:
        with self._lock:
            removed = self.storage.delete_document(doc_id)
            if self.store is not None:
                # copy-on-write: concurrent searches holding the old
                # store/engine snapshot keep consistent row identities
                self.store, _ = self.store.without_doc(doc_id)
                self._rebuild_bm25_locked()
            self.doc_projects.pop(doc_id, None)
            self.page_indexes.pop(doc_id, None)
            self.chunk_nodes = {
                k: v for k, v in self.chunk_nodes.items() if k[0] != doc_id
            }
            self.version += 1
            return removed

    # ---------------- query ----------------

    def search(
        self,
        query_texts: list[str],
        query_embeddings,
        k: int,
        *,
        project: str | None = None,
        candidates: int | None = None,
    ) -> list[list[dict]]:
        """Corpus-wide hybrid search. Returns per-query hit dicts with
        chunk identity + text (the enrichment the reference does at
        faiss_index.py:178-192), optionally filtered by project.

        Concurrency: the (engine, store) pair is snapshotted under the
        lock and used consistently for both the device search and the
        host-side row → identity lookups. Mutations swap in new objects
        (removal is copy-on-write; appends never remap existing rows),
        so a search racing an ingest/delete sees a coherent corpus.
        """
        with self._lock:
            engine, store = self.engine, self.store
            doc_projects = dict(self.doc_projects) if project is not None else {}
        if engine is None or store is None or len(store) == 0:
            return [[] for _ in query_texts]
        pool = candidates or max(k, get_config().RETRIEVAL_CANDIDATES)
        if project is not None:
            # over-fetch, then filter rows by project
            pool = min(pool * 4, len(store))
        # bucket the query count: each distinct Q compiles a fresh XLA
        # program for the dense+BM25+fusion pipeline (~tens of seconds
        # through the remote-compile tunnel), and the micro-batcher
        # produces whatever batch size the arrival pattern gave it.
        # Padding to {1,2,4,8,...} bounds compiles to log2(max_batch)
        # programs; pad queries are empty text + zero vectors, sliced
        # off before enrichment.
        q_n = len(query_texts)
        q_pad = 1
        while q_pad < q_n:
            q_pad *= 2
        if q_pad > q_n:
            import jax.numpy as jnp

            query_texts = list(query_texts) + [""] * (q_pad - q_n)
            query_embeddings = jnp.concatenate(
                [
                    query_embeddings,
                    jnp.zeros(
                        (q_pad - q_n, query_embeddings.shape[1]),
                        query_embeddings.dtype,
                    ),
                ]
            )
        vals, rows = engine.search(
            query_texts, query_embeddings, max(k, pool), candidates=pool
        )
        vals = np.asarray(vals)[:q_n]
        rows = np.asarray(rows)[:q_n]
        results: list[list[dict]] = []
        for qi in range(rows.shape[0]):
            hits: list[dict] = []
            for score, row in zip(vals[qi], rows[qi]):
                if row < 0 or not np.isfinite(score):
                    continue
                ref = store.ref(int(row))
                if project is not None and doc_projects.get(ref.doc_id) != project:
                    continue
                hits.append(
                    {
                        "doc_id": ref.doc_id,
                        "chunk_id": ref.chunk_id,
                        "page": ref.page,
                        "score": float(score),
                        "text": store.texts[int(row)],
                    }
                )
                if len(hits) >= k:
                    break
            results.append(hits)
        return results

    # ---------------- info ----------------

    def list_documents(self) -> list[dict]:
        return [self.storage.document_info(d) for d in self.storage.list_documents()]

    def stats(self) -> dict:
        return {
            "documents": len(self.doc_projects),
            "chunks": len(self.store) if self.store else 0,
            "bm25_vocab": len(self.bm25.vocab) if self.bm25 else 0,
        }


_registry: CorpusRegistry | None = None


def get_registry() -> CorpusRegistry:
    global _registry
    if _registry is None:
        _registry = CorpusRegistry()
        _registry.load_all()
    return _registry


def reset_registry() -> None:
    global _registry
    _registry = None
