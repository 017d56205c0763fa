"""Caches, task queue, metrics, async ingest — the ops-hardening layer
(all dead or absent in the reference: SURVEY.md §5.9, §2.1 #7/#8, §5.5)."""

import time

import httpx
import numpy as np
import pytest

from intool_rag_tpu.observability import Metrics, trace_phase
from intool_rag_tpu.storage.cache import (
    CachingEmbeddingProvider,
    EmbeddingCache,
    QueryResultCache,
)
from intool_rag_tpu.tasks import TaskQueue


class CountingProvider:
    dimension = 8
    model_name = "counting"

    def __init__(self):
        self.calls = 0

    def embed_batch(self, texts, *, is_query=False):
        self.calls += len(texts)
        return np.tile(np.arange(8, dtype=np.float32), (len(texts), 1))


def test_embedding_cache_roundtrip(tmp_storage):
    cache = EmbeddingCache()
    assert cache.get("m", "", "hello") is None
    cache.put("m", "", "hello", np.ones(4, np.float32))
    got = cache.get("m", "", "hello")
    np.testing.assert_array_equal(got, np.ones(4, np.float32))
    assert cache.hits == 1 and cache.misses == 1
    assert cache.clear() == 1


def test_caching_provider_skips_recompute(tmp_storage):
    inner = CountingProvider()
    provider = CachingEmbeddingProvider(inner)
    provider.embed_batch(["a", "b"])
    assert inner.calls == 2
    provider.embed_batch(["a", "b", "c"])
    assert inner.calls == 3  # only "c" recomputed


def test_query_cache_version_invalidation(tmp_storage):
    cache = QueryResultCache()
    cache.put("q", "", "p", 1, {"answer": "x"})
    assert cache.get("q", "", "p", 1) == {"answer": "x"}
    assert cache.get("q", "", "p", 2) is None  # corpus changed


def test_task_queue_lifecycle():
    tq = TaskQueue(workers=2)
    ok = tq.submit("work", lambda: 42)
    bad = tq.submit("boom", lambda: 1 / 0)
    assert tq.wait_all(timeout=5)
    assert tq.get(ok.job_id).status == "done"
    assert tq.get(ok.job_id).result == 42
    failed = tq.get(bad.job_id)
    assert failed.status == "failed"
    assert "ZeroDivisionError" in failed.error
    assert tq.get("nope") is None
    tq.shutdown()


def test_metrics_percentiles():
    m = Metrics()
    for v in (0.1, 0.2, 0.3, 0.4, 1.0):
        m.observe("op", v)
    m.inc("requests", 3)
    snap = m.snapshot()
    assert snap["counters"]["requests"] == 3
    assert snap["latency_s"]["op"]["count"] == 5
    assert snap["latency_s"]["op"]["p50"] == pytest.approx(0.3)
    assert snap["latency_s"]["op"]["p99"] == pytest.approx(1.0)


def test_trace_phase_records():
    m = Metrics()
    with trace_phase("slow", m):
        time.sleep(0.01)
    assert m.snapshot()["latency_s"]["slow"]["p50"] >= 0.01


# ---------------- service integration ----------------


def test_service_async_ingest_and_metrics(tmp_storage, monkeypatch):
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
    try:
        with httpx.Client(base_url=f"http://127.0.0.1:{server.port}", timeout=60) as c:
            r = c.post(
                "/ingest",
                params={"project": "p", "doc_id": "d1", "mode": "async"},
                files={"file": ("t.txt", b"the warranty lasts 24 months in total")},
            )
            assert r.status_code == 200
            job_id = r.json()["job_id"]
            # poll job
            for _ in range(100):
                job = c.get(f"/jobs/{job_id}").json()
                if job["status"] in ("done", "failed"):
                    break
                time.sleep(0.05)
            assert job["status"] == "done", job
            assert job["result"]["chunk_count"] >= 1

            # query twice: second is a cache hit
            q = {"question": "how long is the warranty?"}
            a1 = c.post("/query", json=q).json()
            a2 = c.post("/query", json=q).json()
            assert a1 == a2
            metrics = c.get("/metrics").json()
            assert metrics["counters"]["query_requests"] == 2
            assert metrics["counters"].get("query_cache_hits", 0) == 1
            assert metrics["corpus"]["documents"] == 1

            # ingest invalidates the query cache (version bump)
            c.post(
                "/ingest",
                params={"project": "p", "doc_id": "d2"},
                files={"file": ("u.txt", b"returns accepted within 30 days")},
            )
            a3 = c.post("/query", json=q).json()
            assert "24 months" in a3["answer"]
            metrics = c.get("/metrics").json()
            assert metrics["counters"].get("query_cache_hits", 0) == 1  # miss after bump
            assert c.get("/jobs").json()["jobs"]
    finally:
        server.shutdown()
        reset_semantic_analyzer()
