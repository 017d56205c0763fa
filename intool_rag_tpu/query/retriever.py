"""Page-level retrieval (reference: rag/query/page_retriever.py:78-288).

Flow: embed query → corpus-wide hybrid top-K chunks → group by
(doc, page) → page score = avg(chunk scores) + min(0.05·n_chunks, 0.15)
(page_retriever.py:186-196) with structured-data boosts
(config TABLE_BOOST_MULTIPLIER — declared in the reference, applied here)
→ top-N pages with assembled context and citation metadata.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import get_config
from ..index.registry import CorpusRegistry, get_registry
from ..ingest.schemas import NodeLevel
from ..llm.embeddings import get_embedding_provider


@dataclasses.dataclass
class RetrievedChunk:
    """(reference: page_retriever.py:25-33)"""

    doc_id: str
    chunk_id: str
    page: int
    text: str
    score: float
    has_table: bool = False


@dataclasses.dataclass
class PageRanking:
    """(reference: page_retriever.py:35-75)"""

    doc_id: str
    page: int
    score: float
    chunks: list[RetrievedChunk]
    source_file: str = ""
    chapter: str | None = None
    section: str | None = None
    subsection: str | None = None
    title: str | None = None

    @property
    def context_text(self) -> str:
        ordered = sorted(self.chunks, key=lambda c: c.chunk_id)
        return "\n\n".join(c.text for c in ordered)


class PageLevelRetriever:
    def __init__(
        self,
        registry: CorpusRegistry | None = None,
        provider=None,
        reranker=None,
    ) -> None:
        self.registry = registry or get_registry()
        self._provider = provider
        self._reranker = reranker

    @property
    def provider(self):
        if self._provider is None:
            self._provider = get_embedding_provider()
        return self._provider

    # ---------------- chunks ----------------

    def retrieve_chunks(
        self, query: str, *, project: str | None = None, limit: int | None = None
    ) -> list[RetrievedChunk]:
        cfg = get_config()
        limit = limit or cfg.RETRIEVAL_CANDIDATES
        rerank = cfg.RERANKER_ENABLED and self._reranker is not None
        fetch = max(limit, cfg.RERANKER_CANDIDATES) if rerank else limit
        emb = self.provider.embed_batch([query], is_query=True)
        hits = self.registry.search(
            [query], jnp.asarray(emb), fetch, project=project
        )[0]
        if rerank and hits:
            # retrieve-N → cross-encoder rerank (config.py:25-27 contract);
            # sigmoid maps logits into the [0,1] page-scoring space
            import math

            reranked = self._reranker.rerank(query, hits, top_k=limit)
            for h in reranked:
                h["score"] = 1.0 / (1.0 + math.exp(-h["rerank_score"]))
            hits = reranked
        from ..ingest.chunker import _TABLE_HINT

        chunks = [
            RetrievedChunk(
                doc_id=h["doc_id"],
                chunk_id=h["chunk_id"],
                page=h["page"],
                text=h["text"],
                score=h["score"],
                has_table=bool(_TABLE_HINT.search(h["text"])),
            )
            for h in hits
        ]
        return [c for c in chunks if c.score >= cfg.RETRIEVAL_MIN_SCORE] or chunks[:5]

    # ---------------- pages ----------------

    def rank_pages(
        self, chunks: list[RetrievedChunk], top_pages: int | None = None
    ) -> list[PageRanking]:
        cfg = get_config()
        top_pages = top_pages or cfg.TOP_PAGES
        groups: dict[tuple[str, int], list[RetrievedChunk]] = {}
        for chunk in chunks:
            groups.setdefault((chunk.doc_id, chunk.page), []).append(chunk)

        rankings: list[PageRanking] = []
        for (doc_id, page), page_chunks in groups.items():
            # reference formula: avg + min(0.05·n, 0.15)
            # (page_retriever.py:186-196)
            avg = sum(c.score for c in page_chunks) / len(page_chunks)
            boost = min(cfg.PAGE_CHUNK_BOOST * len(page_chunks), cfg.PAGE_CHUNK_BOOST_CAP)
            score = avg + boost
            if cfg.TABLE_CONTEXT_PRIORITY and any(c.has_table for c in page_chunks):
                score *= cfg.TABLE_BOOST_MULTIPLIER
            ranking = PageRanking(
                doc_id=doc_id, page=page, score=score, chunks=page_chunks
            )
            self._attach_citation(ranking)
            rankings.append(ranking)
        rankings.sort(key=lambda r: -r.score)
        return rankings[:top_pages]

    def _attach_citation(self, ranking: PageRanking) -> None:
        """Resolve chapter/section/subsection from the semantic tree via
        the page's best chunk's node ancestry."""
        page_index = self.registry.page_indexes.get(ranking.doc_id)
        if page_index is None:
            return
        ranking.source_file = page_index.source_file
        best = max(ranking.chunks, key=lambda c: c.score)
        node_id = self.registry.chunk_nodes.get((ranking.doc_id, best.chunk_id), "")
        node = page_index.get_node(node_id) if node_id else None
        if node is None:
            nodes = page_index.nodes_for_page(ranking.page)
            node = nodes[0] if nodes else None
        if node is None:
            return
        ranking.title = node.title
        for ancestor in page_index.ancestry(node.node_id):
            if ancestor.level is NodeLevel.CHAPTER:
                ranking.chapter = ancestor.title
            elif ancestor.level is NodeLevel.SECTION:
                ranking.section = ancestor.title
            elif ancestor.level is NodeLevel.SUBSECTION:
                ranking.subsection = ancestor.title

    # ---------------- batched path (micro-batching) ----------------

    def retrieve_chunks_batch(
        self,
        queries: list[str],
        projects: list[str | None],
        *,
        limit: int | None = None,
    ) -> list[list[RetrievedChunk]]:
        """Batched retrieval: one embedding forward + one device search for
        the whole batch (the reference is 1-query-at-a-time —
        faiss_index.py:81). Per-query project filters apply on the host."""
        cfg = get_config()
        limit = limit or cfg.RETRIEVAL_CANDIDATES
        # same rerank contract as the single-query path above: fetch a
        # wider pool and cross-encoder rerank per query (round-5 review:
        # routing /search through the batcher silently dropped reranking
        # because this runner had no reranker path)
        rerank = cfg.RERANKER_ENABLED and self._reranker is not None
        fetch = max(limit, cfg.RERANKER_CANDIDATES) if rerank else limit
        # device-resident embed when the provider supports it: skips
        # the device→host→device round trip (~50 ms/batch on the TPU
        # tunnel) that embed_batch + jnp.asarray would pay
        emb_dev_fn = getattr(self.provider, "embed_batch_device", None)
        emb = emb_dev_fn(list(queries), is_query=True) if emb_dev_fn else None
        if emb is not None:
            emb = emb[: len(queries)]
        else:
            emb = jnp.asarray(
                self.provider.embed_batch(list(queries), is_query=True)
            )
        # over-fetch when any project filter is present
        if any(p is not None for p in projects):
            fetch = fetch * 4
        hit_lists = self.registry.search(list(queries), emb, fetch)
        from ..ingest.chunker import _TABLE_HINT

        out: list[list[RetrievedChunk]] = []
        for query, hits, project in zip(queries, hit_lists, projects):
            if project is not None:
                hits = [
                    h for h in hits
                    if self.registry.doc_projects.get(h["doc_id"]) == project
                ]
            if rerank and hits:
                import math

                reranked = self._reranker.rerank(query, hits, top_k=limit)
                for h in reranked:
                    h["score"] = 1.0 / (1.0 + math.exp(-h["rerank_score"]))
                hits = reranked
            hits = hits[:limit]
            chunks = [
                RetrievedChunk(
                    doc_id=h["doc_id"], chunk_id=h["chunk_id"], page=h["page"],
                    text=h["text"], score=h["score"],
                    has_table=bool(_TABLE_HINT.search(h["text"])),
                )
                for h in hits
            ]
            kept = [c for c in chunks if c.score >= cfg.RETRIEVAL_MIN_SCORE]
            out.append(kept or chunks[:5])
        return out

    def retrieve_and_rank_pages_batch(
        self,
        queries: list[str],
        projects: list[str | None],
        *,
        top_pages: int | None = None,
    ) -> list[list[PageRanking]]:
        chunk_lists = self.retrieve_chunks_batch(queries, projects)
        return [
            self.rank_pages(chunks, top_pages) if chunks else []
            for chunks in chunk_lists
        ]

    # ---------------- façade ----------------

    def retrieve_and_rank_pages(
        self,
        query: str,
        *,
        project: str | None = None,
        top_pages: int | None = None,
    ) -> list[PageRanking]:
        """(reference: page_retriever.py:271)"""
        chunks = self.retrieve_chunks(query, project=project)
        if not chunks:
            return []
        return self.rank_pages(chunks, top_pages)


def retrieve_and_rank_pages(
    query: str, *, project: str | None = None, top_pages: int | None = None
) -> list[PageRanking]:
    return PageLevelRetriever().retrieve_and_rank_pages(
        query, project=project, top_pages=top_pages
    )
