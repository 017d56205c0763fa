"""Query micro-batching tests: coalescing, correctness, error paths, and
concurrent HTTP requests through the service."""

import threading
import time

import httpx
import numpy as np
import pytest

from intool_rag_tpu.service.batcher import QueryBatcher


class CountingRunner:
    def __init__(self, delay: float = 0.0, fail: bool = False):
        self.calls = []
        self.delay = delay
        self.fail = fail

    def __call__(self, queries, projects):
        self.calls.append(list(queries))
        if self.delay:
            time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("runner boom")
        return [f"result:{q}:{p}" for q, p in zip(queries, projects)]


def test_single_request_passthrough():
    runner = CountingRunner()
    b = QueryBatcher(runner, window_ms=1, max_batch=8)
    assert b.submit("q1", "p") == "result:q1:p"
    assert runner.calls == [["q1"]]


def test_concurrent_requests_coalesce():
    runner = CountingRunner()
    b = QueryBatcher(runner, window_ms=60, max_batch=8)
    results = {}

    def worker(q):
        results[q] = b.submit(q, None)

    threads = [threading.Thread(target=worker, args=(f"q{i}",)) for i in range(5)]
    for t in threads:
        t.start()
        time.sleep(0.005)  # all arrive inside the leader's window
    for t in threads:
        t.join()
    assert results == {f"q{i}": f"result:q{i}:None" for i in range(5)}
    assert b.batches_run == 1, f"expected one coalesced batch, got {runner.calls}"
    assert sorted(runner.calls[0]) == [f"q{i}" for i in range(5)]


def test_max_batch_splits():
    runner = CountingRunner()
    b = QueryBatcher(runner, window_ms=50, max_batch=2)
    results = []
    threads = [
        threading.Thread(target=lambda i=i: results.append(b.submit(f"q{i}", None)))
        for i in range(5)
    ]
    for t in threads:
        t.start()
        time.sleep(0.004)
    for t in threads:
        t.join()
    assert len(results) == 5
    assert all(len(c) <= 2 for c in runner.calls)


def test_error_propagates_to_all():
    runner = CountingRunner(fail=True)
    b = QueryBatcher(runner, window_ms=10, max_batch=8)
    with pytest.raises(RuntimeError, match="runner boom"):
        b.submit("q", None)


def test_service_concurrent_queries_batched(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    monkeypatch.setenv("QUERY_MICRO_BATCH_WINDOW_MS", "40")
    monkeypatch.setenv("CACHE_QUERY_RESULTS", "false")
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
    assert svc.batcher is not None
    server = ServiceServer(service=svc, host="127.0.0.1", port=0)
    server.start_background()
    try:
        # generous timeout: the first query triggers XLA compilation which
        # can exceed httpx's 5 s default when the host is under load
        with httpx.Client(
            base_url=f"http://127.0.0.1:{server.port}", timeout=120.0
        ) as c:
            c.post(
                "/ingest",
                params={"project": "p", "doc_id": "d1"},
                files={"file": ("t.txt",
                                b"warranty lasts 24 months. returns in 30 days. "
                                b"shipping is free over 50 dollars.")},
            )
            answers = {}

            def ask(q):
                answers[q] = c.post("/query", json={"question": q}).json()

            threads = [
                threading.Thread(target=ask, args=(q,))
                for q in ("warranty months?", "returns days?", "shipping cost?")
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert "24 months" in answers["warranty months?"]["answer"]
            assert "30 days" in answers["returns days?"]["answer"]
            metrics = c.get("/metrics").json()
            assert metrics["batcher"]["requests_served"] == 3
            # at least some coalescing happened
            assert metrics["batcher"]["batches_run"] <= 3
    finally:
        server.shutdown()
        reset_semantic_analyzer()


def test_service_search_routes_through_batcher(tmp_storage, monkeypatch):
    """Round 5: /search bypassed the batcher (only /query used it) —
    measured on the TPU tunnel as p50 2.5 s at concurrency 8 because
    every handler thread ran its own retrieval program. /search must
    coalesce exactly like /query."""
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    monkeypatch.setenv("QUERY_MICRO_BATCH_WINDOW_MS", "40")
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
    assert svc.batcher is not None
    server = ServiceServer(service=svc, host="127.0.0.1", port=0)
    server.start_background()
    try:
        with httpx.Client(
            base_url=f"http://127.0.0.1:{server.port}", timeout=120.0
        ) as c:
            c.post(
                "/ingest",
                params={"project": "p", "doc_id": "d1"},
                files={"file": ("t.txt",
                                b"warranty lasts 24 months. returns in 30 days. "
                                b"shipping is free over 50 dollars.")},
            )
            hits = {}

            def ask(q):
                hits[q] = c.post(
                    "/search", json={"question": q, "top_k": 3}
                ).json()

            threads = [
                threading.Thread(target=ask, args=(q,))
                for q in ("warranty months?", "returns days?", "shipping cost?")
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for q, out in hits.items():
                assert out["total"] >= 1, (q, out)
                assert "text" in out["hits"][0]
            metrics = c.get("/metrics").json()
            assert metrics["batcher"]["requests_served"] == 3
            assert metrics["batcher"]["batches_run"] <= 3
    finally:
        server.shutdown()
        reset_semantic_analyzer()
