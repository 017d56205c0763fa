"""LLM factory with fallback chain (reference: rag/llm/factory.py:8-45):
explicit LLM_PROVIDER override, else Gemini when a key is set, else
Ollama when reachable, else the deterministic FakeLLM (the reference has
no offline terminal fallback)."""

from __future__ import annotations

import threading

from ..config import get_config
from ..logging import get_logger
from .base import BaseLLM

logger = get_logger(__name__)

_llm: BaseLLM | None = None
_lock = threading.Lock()


def _build() -> BaseLLM:
    cfg = get_config()
    choice = cfg.LLM_PROVIDER.lower()
    if choice == "fake":
        from ..providers.fake import FakeLLM

        return FakeLLM()
    if choice == "tpu":
        from ..providers.tpu_llm import TPULLM

        return TPULLM()
    if choice == "gemini" or (not choice and cfg.GEMINI_API_KEY):
        from ..providers.gemini import GeminiLLM

        llm = GeminiLLM()
        if llm.is_ready():
            return llm
        logger.warning("gemini LLM not ready, falling through")
    if choice in ("", "ollama", "local", "http"):
        from ..providers.ollama import OllamaLLM

        llm = OllamaLLM()
        if llm.is_ready():
            return llm
        logger.warning("ollama not reachable at %s", cfg.LLM_BASE_URL)
    from ..providers.fake import FakeLLM

    logger.warning("no LLM provider reachable — using extractive FakeLLM")
    return FakeLLM()


def get_llm() -> BaseLLM:
    global _llm
    if _llm is None:
        with _lock:
            if _llm is None:
                _llm = _build()
    return _llm


def reset_llm() -> None:
    global _llm
    _llm = None
