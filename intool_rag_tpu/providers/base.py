"""Shared provider helpers (reference: rag/providers/base.py:6-32)."""

from __future__ import annotations

from ..config import get_config


def instruction_prefix(is_query: bool) -> str:
    """Embedding instruction prefixes from config
    (reference: rag/config.py:53-60)."""
    cfg = get_config()
    return (
        cfg.EMBEDDING_QUERY_INSTRUCTION if is_query else cfg.EMBEDDING_PASSAGE_INSTRUCTION
    )
