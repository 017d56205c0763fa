"""End-to-end service tests: the five endpoints over real HTTP (httpx →
stdlib server), offline providers. This is the reference's full
ingest→query loop (SURVEY.md §3.1-3.2) on the minimum slice."""

import httpx
import pytest

from intool_rag_tpu.index.registry import CorpusRegistry
from intool_rag_tpu.providers.fake import FakeLLM
from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
from intool_rag_tpu.service.app import RAGService
from intool_rag_tpu.service.http import ServiceServer

from test_pdf import build_minimal_pdf

DOC = """Company Handbook

1. Warranty Policy

All products carry a warranty of 24 months from the date of purchase.
Defects covered include manufacturing faults and material failures.

2. Return Policy

Items may be returned within 30 days with the original receipt.
Refunds are processed within 5 business days after inspection.
"""


@pytest.fixture
def service(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    svc = RAGService(
        registry=CorpusRegistry(),
        llm=FakeLLM(),
        provider=HashEmbeddingProvider(128),
    )
    yield svc
    reset_semantic_analyzer()


@pytest.fixture
def client(service):
    server = ServiceServer(service=service, host="127.0.0.1", port=0)
    server.start_background()
    with httpx.Client(base_url=f"http://127.0.0.1:{server.port}", timeout=60) as c:
        yield c
    server.shutdown()


def _ingest(client, content: bytes, name: str, project="p1", **params) -> dict:
    resp = client.post(
        "/ingest",
        params={"project": project, **params},
        files={"file": (name, content, "application/pdf")},
    )
    assert resp.status_code == 200, resp.text
    return resp.json()


def test_health_empty(client):
    resp = client.get("/health")
    assert resp.status_code == 200
    body = resp.json()
    assert body["status"] == "ok"
    assert body["documents"] == 0


def test_ingest_query_roundtrip(client):
    pdf = build_minimal_pdf([DOC])
    result = _ingest(client, pdf, "handbook.pdf", doc_id="hb1")
    assert result["success"] and result["doc_id"] == "hb1"
    assert result["total_chunks"] >= 1
    assert result["vectors_indexed"] == result["total_chunks"]

    resp = client.post("/query", json={"question": "How long is the warranty?"})
    assert resp.status_code == 200, resp.text
    body = resp.json()
    assert "24 months" in body["answer"]
    assert body["sources"], "must cite sources"
    assert body["sources"][0]["source_file"] == "handbook.pdf"
    assert body["confidence"] in ("high", "medium", "low")


def test_query_no_results(client):
    resp = client.post("/query", json={"question": "anything at all?"})
    assert resp.status_code == 200
    assert "could not find" in resp.json()["answer"].lower()


def test_documents_listing_and_detail(client):
    _ingest(client, build_minimal_pdf([DOC]), "a.pdf", doc_id="docA")
    _ingest(client, b"plain text about quarterly finances and revenue",
            "b.txt", doc_id="docB", project="p2")
    listing = client.get("/documents").json()
    assert listing["total"] == 2
    ids = {d["doc_id"] for d in listing["documents"]}
    assert ids == {"docA", "docB"}

    detail = client.get("/documents/docA").json()
    assert detail["doc_id"] == "docA"
    assert detail["page_count"] >= 1
    assert detail["nodes"], "semantic tree returned"

    missing = client.get("/documents/nope")
    assert missing.status_code == 404


def test_project_filter(client):
    _ingest(client, b"the fox lives in the forest with other foxes",
            "fox.txt", doc_id="fox", project="animals")
    _ingest(client, b"the invoice total is 500 dollars due next month",
            "inv.txt", doc_id="inv", project="billing")
    resp = client.post(
        "/query", json={"question": "fox forest", "project": "billing"}
    ).json()
    for src in resp["sources"]:
        assert src["source_file"] == "inv.txt"


def test_delete_document(client):
    _ingest(client, b"temporary document content here", "t.txt", doc_id="tmp1")
    assert client.delete("/documents/tmp1").status_code == 200
    assert client.get("/documents").json()["total"] == 0
    assert client.delete("/documents/tmp1").status_code == 404


def test_query_streaming_sse(client):
    _ingest(client, build_minimal_pdf([DOC]), "handbook.pdf", doc_id="hbs")
    events = []
    with client.stream(
        "POST", "/query",
        json={"question": "How long is the warranty?", "stream": True},
    ) as resp:
        assert resp.status_code == 200
        assert resp.headers["content-type"].startswith("text/event-stream")
        buffer = ""
        for chunk in resp.iter_text():
            buffer += chunk
        for block in buffer.strip().split("\n\n"):
            lines = dict(
                ln.split(": ", 1) for ln in block.splitlines() if ": " in ln
            )
            if "event" in lines:
                events.append((lines["event"], lines.get("data", "")))
    kinds = [k for k, _ in events]
    assert kinds[0] == "sources"
    assert "token" in kinds
    assert kinds[-1] == "done"
    token_text = "".join(
        __import__("json").loads(d)["text"] for k, d in events if k == "token"
    )
    assert "24 months" in token_text


def test_search_endpoint(client):
    _ingest(client, build_minimal_pdf([DOC]), "handbook.pdf", doc_id="hb2")
    r = client.post("/search", json={"question": "warranty months"})
    assert r.status_code == 200
    body = r.json()
    assert body["total"] >= 1
    hit = body["hits"][0]
    assert hit["doc_id"] == "hb2"
    assert "24 months" in hit["text"]
    assert hit["score"] > 0
    assert client.post("/search", content=b"garbage").status_code == 400


def test_bad_requests(client):
    assert client.post("/query", content=b"not json").status_code == 400
    assert client.post("/ingest", params={"project": "p"}).status_code == 400
    resp = client.post(
        "/ingest", files={"file": ("a.txt", b"x")}
    )  # missing project
    assert resp.status_code == 400
    assert client.get("/nope").status_code == 404


def test_ingest_unsupported_format(client):
    resp = client.post(
        "/ingest",
        params={"project": "p1"},
        files={"file": ("a.docx", b"\x00\x01", "application/octet-stream")},
    )
    assert resp.status_code == 400
    assert "unsupported" in resp.json()["detail"].lower()
