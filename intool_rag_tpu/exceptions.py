"""Typed exception hierarchy.

Capability parity with the reference's error tree (reference:
rag/core/exceptions.py:4-127): a single root with provider, retrieval,
store, ingest, cache and config branches, so callers can catch at any
granularity.
"""

from __future__ import annotations


class RAGError(Exception):
    """Root of the framework's exception tree."""


# --- Provider errors ---
class ProviderError(RAGError):
    pass


class EmbeddingProviderError(ProviderError):
    pass


class LLMProviderError(ProviderError):
    pass


class RerankerError(ProviderError):
    pass


class ProviderConnectionError(ProviderError):
    pass


class ProviderTimeoutError(ProviderError):
    pass


# --- Retrieval errors ---
class RetrievalError(RAGError):
    pass


class VectorSearchError(RetrievalError):
    pass


class FilterError(RetrievalError):
    pass


# --- Vector store errors ---
class VectorStoreError(RAGError):
    pass


class IndexBuildError(VectorStoreError):
    pass


class IndexLoadError(VectorStoreError):
    pass


class IndexNotFoundError(VectorStoreError):
    pass


# --- Ingestion errors ---
class IngestError(RAGError):
    pass


class ChunkingError(IngestError):
    pass


class DocumentLoadError(IngestError):
    pass


class UnsupportedFormatError(DocumentLoadError):
    pass


class PDFParseError(DocumentLoadError):
    pass


# --- Cache errors ---
class CacheError(RAGError):
    pass


# --- Config errors ---
class ConfigError(RAGError):
    pass


# --- Sharding / distributed errors (new; no reference equivalent) ---
class ShardingError(RAGError):
    pass
