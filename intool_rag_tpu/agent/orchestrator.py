"""Agent orchestrator: the 11-step pipeline
(reference: rag/agent/orchestrator.py:90-147 — with the 3-args-vs-2-params
call bug fixed by construction and all steps wired to live components)."""

from __future__ import annotations

from ..index.registry import CorpusRegistry
from ..llm.base import BaseLLM
from ..llm.factory import get_llm
from ..logging import get_logger
from ..query.retriever import PageLevelRetriever
from .state import INTENT_CONFIG, AgentState
from .steps import (
    AnswerGenerator,
    ContextAssembler,
    Formatter,
    IntentClassifier,
    PageSelector,
    QueryNormalizer,
    Searcher,
    Validator,
)

logger = get_logger(__name__)

_NO_ANSWER = (
    "I could not find sufficiently relevant pages to answer this question."
)


class PageAwareAgent:
    def __init__(
        self,
        registry: CorpusRegistry | None = None,
        llm: BaseLLM | None = None,
        provider=None,
    ) -> None:
        retriever = PageLevelRetriever(registry, provider=provider)
        self.normalizer = QueryNormalizer()
        self.classifier = IntentClassifier()
        self.searcher = Searcher(retriever)
        self.selector = PageSelector()
        self.assembler = ContextAssembler(registry=retriever.registry)
        self.generator = AnswerGenerator(llm or get_llm())
        self.validator = Validator()
        self.formatter = Formatter()

    def query(self, question: str, *, project: str | None = None) -> dict:
        state = AgentState(raw_query=question)

        state.normalized_query = self.normalizer.normalize(question)
        state.log_step("normalize")

        state.intent = self.classifier.classify(state.normalized_query)
        state.retrieval_config = dict(INTENT_CONFIG[state.intent])
        state.log_step(f"intent:{state.intent.value}")

        self.searcher.run(state, project)
        state.log_step("search+load+group")

        self.selector.run(state)
        state.log_step("select")

        if not state.is_valid_to_answer():
            state.answer = _NO_ANSWER
            state.answer_confidence = "low"
            state.log_step("gate:rejected")
            return self.formatter.run(state)

        self.assembler.run(state)
        state.log_step("assemble")

        self.generator.run(state)
        state.log_step("generate")

        self.validator.run(state)
        state.log_step("validate")

        return self.formatter.run(state)
