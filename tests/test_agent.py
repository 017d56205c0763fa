"""Agent pipeline tests: steps, gate, and the mounted /agent/query route."""

import httpx
import pytest

from intool_rag_tpu.agent.state import INTENT_CONFIG, AgentState, QueryIntent
from intool_rag_tpu.agent.steps import IntentClassifier, QueryNormalizer


def test_normalizer_removes_fillers():
    n = QueryNormalizer()
    assert n.normalize("Could you please tell me the warranty period?") == \
        "the warranty period?"


def test_intent_classification():
    c = IntentClassifier()
    assert c.classify("compare plan A versus plan B") is QueryIntent.COMPARE
    assert c.classify("summarize the document") is QueryIntent.SUMMARIZE
    assert c.classify("how does ingestion work?") is QueryIntent.EXPLAIN
    assert c.classify("warranty period") is QueryIntent.LOOKUP


def test_intent_config_table():
    # reference table: top_k 30/50/100/80, max_pages 3/5/10/8 (state.py:126-157)
    assert INTENT_CONFIG[QueryIntent.LOOKUP]["top_k"] == 30
    assert INTENT_CONFIG[QueryIntent.SUMMARIZE]["max_pages"] == 10
    assert INTENT_CONFIG[QueryIntent.COMPARE]["context_budget"] == 10000


def test_gate_rejects_low_scores():
    state = AgentState(raw_query="q")
    state.selected_pages = []
    assert not state.is_valid_to_answer()


@pytest.fixture
def agent_service(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    from intool_rag_tpu.index.registry import CorpusRegistry
    from intool_rag_tpu.providers.fake import FakeLLM
    from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
    from intool_rag_tpu.service.app import RAGService
    from intool_rag_tpu.service.http import ServiceServer

    svc = RAGService(
        registry=CorpusRegistry(), llm=FakeLLM(), provider=HashEmbeddingProvider(64)
    )
    server = ServiceServer(service=svc, host="127.0.0.1", port=0)
    server.start_background()
    # generous timeout: agent steps jit-compile on first use and the host
    # can be under load (e.g. a concurrent TPU benchmark's CPU baseline)
    with httpx.Client(
        base_url=f"http://127.0.0.1:{server.port}", timeout=120.0
    ) as c:
        yield c
    server.shutdown()
    reset_semantic_analyzer()


def test_agent_end_to_end(agent_service):
    c = agent_service
    c.post(
        "/ingest",
        params={"project": "p", "doc_id": "d1"},
        files={
            "file": (
                "policy.txt",
                b"Warranty Policy\n\nThe warranty period is 24 months. "
                b"Coverage includes manufacturing defects and parts.",
            )
        },
    )
    r = c.post("/agent/query", json={"question": "how long is the warranty period?"})
    assert r.status_code == 200, r.text
    body = r.json()
    assert "24 months" in body["answer"]
    assert body["intent"] == "explain"  # "how" → EXPLAIN
    assert body["source"]["page"] == 1
    assert body["state"]["steps"][-1] == "validate"
    assert body["validation"]["passed"]
    assert body["execution_time_ms"] > 0


def test_agent_gate_on_empty_corpus(agent_service):
    r = agent_service.post("/agent/query", json={"question": "anything?"})
    assert r.status_code == 200
    body = r.json()
    assert "could not find" in body["answer"].lower()
    assert body["state"]["steps"][-1] == "select" or "gate:rejected" in body["state"]["steps"]


def test_agent_health(agent_service):
    assert agent_service.get("/agent/health").json()["status"] == "ok"
