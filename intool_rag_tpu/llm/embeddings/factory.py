"""Embedding provider factory (reference: rag/llm/embeddings/factory.py).

Selection: ``EMBEDDING_PROVIDER`` env override first, else Gemini when an
API key is set, else the TPU encoder, else the deterministic hash
embedder. Unlike the reference (whose provider ignores the configured
model — SURVEY.md §5.6), the chosen provider reports its true model and
dimension, and the chain degrades gracefully offline.
"""

from __future__ import annotations

import threading

from ...config import get_config
from ...logging import get_logger
from .base import EmbeddingProvider

logger = get_logger(__name__)

_provider: EmbeddingProvider | None = None
_lock = threading.Lock()


def _build() -> EmbeddingProvider:
    cfg = get_config()
    choice = cfg.EMBEDDING_PROVIDER.lower()
    if choice == "hash":
        from ...providers.hash_embed import HashEmbeddingProvider

        return HashEmbeddingProvider()
    if choice == "ollama":
        from ...providers.ollama_embed import OllamaEmbeddingProvider

        return OllamaEmbeddingProvider()
    if choice == "gemini" or (not choice and cfg.GEMINI_API_KEY):
        try:
            from ...providers.gemini import GeminiEmbeddingProvider

            provider = GeminiEmbeddingProvider()
            if cfg.GEMINI_API_KEY:
                return provider
        except Exception as exc:
            logger.warning("gemini embeddings unavailable: %s", exc)
    if choice in ("", "tpu", "hf"):
        try:
            from ...providers.tpu_embed import TPUEmbeddingProvider

            return TPUEmbeddingProvider()
        except Exception as exc:
            logger.warning("TPU embedding provider unavailable: %s", exc)
    from ...providers.hash_embed import HashEmbeddingProvider

    logger.warning("falling back to hash embeddings")
    return HashEmbeddingProvider()


def get_embedding_provider() -> EmbeddingProvider:
    global _provider
    if _provider is None:
        with _lock:
            if _provider is None:
                _provider = _build()
    return _provider


def reset_embedding_provider() -> None:
    global _provider
    _provider = None
