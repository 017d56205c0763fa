"""Logging setup (reference: rag/logging.py:1-9).

One root configuration; module loggers via ``get_logger(__name__)``.
"""

from __future__ import annotations

import logging as _logging

from .config import get_config

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    _logging.basicConfig(level=get_config().LOG_LEVEL, format=_FORMAT)
    _configured = True


def get_logger(name: str) -> _logging.Logger:
    _configure()
    return _logging.getLogger(name)
