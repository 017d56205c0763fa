"""Ollama provider: generation + semantic analysis over local HTTP
(reference: rag/providers/ollama/ — SURVEY.md §2.5 #30)."""

from __future__ import annotations

import json
from typing import Iterator

from ..config import get_config
from ..exceptions import LLMProviderError
from ..llm.base import BaseLLM
from ..llm.semantic.base import SectionSpec, SemanticAnalyzer
from .http_utils import get_http_client, request_with_retry
from .json_utils import sanitize_json
from .prompts import STRUCTURE_ANALYSIS_PROMPT, tag_pages


class OllamaLLM(BaseLLM):
    def __init__(self, model: str | None = None, base_url: str | None = None) -> None:
        cfg = get_config()
        self.model = model or cfg.LLM_MODEL
        self.base_url = (base_url or cfg.LLM_BASE_URL).rstrip("/")

    def generate(self, prompt: str, **kwargs) -> str:
        cfg = get_config()
        resp = request_with_retry(
            "POST",
            f"{self.base_url}/api/generate",
            json={
                "model": self.model,
                "prompt": prompt,
                "stream": False,
                "options": {
                    "temperature": kwargs.get("temperature", cfg.LLM_TEMPERATURE),
                    "num_predict": kwargs.get("max_tokens", cfg.LLM_MAX_TOKENS),
                },
            },
        )
        if resp.status_code != 200:
            raise LLMProviderError(f"ollama generate failed: {resp.status_code}")
        return resp.json().get("response", "")

    def generate_stream(self, prompt: str, **kwargs) -> Iterator[str]:
        cfg = get_config()
        with get_http_client().stream(
            "POST",
            f"{self.base_url}/api/generate",
            json={"model": self.model, "prompt": prompt, "stream": True,
                  "options": {"temperature": kwargs.get("temperature", cfg.LLM_TEMPERATURE)}},
        ) as resp:
            for line in resp.iter_lines():
                if not line:
                    continue
                chunk = json.loads(line)
                if chunk.get("response"):
                    yield chunk["response"]
                if chunk.get("done"):
                    break

    def is_ready(self) -> bool:
        try:
            return (
                get_http_client().get(f"{self.base_url}/api/tags", timeout=2.0).status_code
                == 200
            )
        except Exception:
            return False

    def get_info(self) -> dict:
        return {"provider": "ollama", "model": self.model, "base_url": self.base_url}


class OllamaSemanticAnalyzer(SemanticAnalyzer):
    def __init__(self, llm: OllamaLLM | None = None) -> None:
        self.llm = llm or OllamaLLM()

    def analyze(self, pages: list[str]) -> list[SectionSpec]:
        prompt = STRUCTURE_ANALYSIS_PROMPT.format(document=tag_pages(pages))
        raw = self.llm.generate(prompt, temperature=0.0, max_tokens=16384)
        data = sanitize_json(raw)
        sections = data.get("sections", data) if isinstance(data, dict) else data
        return [
            SectionSpec(
                title=str(s.get("title", ""))[:120],
                level=s.get("level", "section"),
                page_index=int(s.get("page_index", 0)),
                summary=str(s.get("summary", "")),
            )
            for s in sections
            if isinstance(s, dict) and s.get("title")
        ]
