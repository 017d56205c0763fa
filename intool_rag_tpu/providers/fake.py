"""Deterministic offline providers: extractive fake LLM.

The test/fallback generation provider (no network). Given a RAG prompt,
it answers extractively: sentences from the context that overlap the
question's terms, or a fixed string otherwise. Deterministic, so service
tests can assert on behavior (the fake-provider strategy of SURVEY.md §4).
"""

from __future__ import annotations

import re

from ..index.analyzer import tokenize
from ..llm.base import BaseLLM

_SENT_SPLIT = re.compile(r"(?<=[.!?。！？])\s+")


class FakeLLM(BaseLLM):
    def __init__(self, max_sentences: int = 3) -> None:
        self.max_sentences = max_sentences

    def generate(self, prompt: str, **kwargs) -> str:
        question, context = _split_prompt(prompt)
        q_terms = set(tokenize(question))
        # drop context block headers ("[Page N | ...]") from extraction
        context = re.sub(r"(?m)^\[[^\]\n]{0,160}\]\s*", "", context)
        if not q_terms or not context:
            return "I could not find relevant information in the context."
        scored: list[tuple[int, str]] = []
        for sent in _SENT_SPLIT.split(context):
            overlap = len(q_terms & set(tokenize(sent)))
            if overlap:
                scored.append((overlap, sent.strip()))
        scored.sort(key=lambda t: -t[0])
        if not scored:
            return "I could not find relevant information in the context."
        return " ".join(s for _, s in scored[: self.max_sentences])

    def is_ready(self) -> bool:
        return True

    def get_info(self) -> dict:
        return {"provider": "fake", "mode": "extractive"}


def _split_prompt(prompt: str) -> tuple[str, str]:
    """Pull question/context out of the standard RAG prompt layout
    (query/prompts.py); degrade to whole-prompt context otherwise."""
    q_match = re.search(r"(?is)question:\s*(.+?)(?:\n\n|answer:|$)", prompt)
    c_match = re.search(r"(?is)context:\s*(.+?)(?:\n\nquestion:|$)", prompt)
    question = q_match.group(1).strip() if q_match else prompt[-500:]
    context = c_match.group(1).strip() if c_match else prompt
    return question, context
