"""BaseLLM port (reference: rag/llm/base.py:9-83)."""

from __future__ import annotations

import abc
from typing import Iterator


class BaseLLM(abc.ABC):
    """Text-generation capability."""

    @abc.abstractmethod
    def generate(self, prompt: str, **kwargs) -> str:
        """Generate a completion for the prompt."""

    def generate_stream(self, prompt: str, **kwargs) -> Iterator[str]:
        """Stream completion chunks; default = one-shot fallback."""
        yield self.generate(prompt, **kwargs)

    @abc.abstractmethod
    def is_ready(self) -> bool:
        """Whether the provider can serve requests."""

    def get_info(self) -> dict:
        return {"provider": type(self).__name__}
