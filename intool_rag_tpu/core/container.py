"""Dependency container: lazy singletons + clean shutdown
(reference: rag/core/container.py:10-136 — pooled HTTP client, provider
singletons, shutdown())."""

from __future__ import annotations

import threading

from ..logging import get_logger

logger = get_logger(__name__)


class Container:
    """Owns process-wide resources; everything constructs lazily."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._http_client = None
        self._llm = None
        self._embedding_provider = None
        self._registry = None

    def get_http_client(self):
        if self._http_client is None:
            with self._lock:
                if self._http_client is None:
                    from ..providers.http_utils import get_http_client

                    self._http_client = get_http_client()
        return self._http_client

    def get_llm_provider(self):
        if self._llm is None:
            with self._lock:
                if self._llm is None:
                    from ..llm.factory import get_llm

                    self._llm = get_llm()
        return self._llm

    def get_embedding_provider(self):
        if self._embedding_provider is None:
            with self._lock:
                if self._embedding_provider is None:
                    from ..llm.embeddings.factory import get_embedding_provider

                    self._embedding_provider = get_embedding_provider()
        return self._embedding_provider

    def get_registry(self):
        if self._registry is None:
            with self._lock:
                if self._registry is None:
                    from ..index.registry import get_registry

                    self._registry = get_registry()
        return self._registry

    def shutdown(self) -> None:
        """Release pooled resources (reference: container shutdown)."""
        if self._http_client is not None:
            try:
                self._http_client.close()
            except Exception as exc:
                logger.warning("http client close failed: %s", exc)
            self._http_client = None
        self._llm = None
        self._embedding_provider = None
        self._registry = None


_container: Container | None = None
_container_lock = threading.Lock()


def get_container() -> Container:
    global _container
    if _container is None:
        with _container_lock:
            if _container is None:
                _container = Container()
    return _container


def reset_container() -> None:
    global _container
    if _container is not None:
        _container.shutdown()
    _container = None
