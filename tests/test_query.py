"""Query pipeline tests: page ranking math, citations, response assembly."""

import numpy as np
import pytest

from intool_rag_tpu.query.response import (
    ResponseAssembler,
    build_rag_prompt,
    create_page_aware_response,
    estimate_confidence,
)
from intool_rag_tpu.query.retriever import (
    PageLevelRetriever,
    PageRanking,
    RetrievedChunk,
)


def _chunk(doc, page, score, cid="c_000_000", text="text", table=False):
    return RetrievedChunk(doc, cid, page, text, score, has_table=table)


class _Reg:
    page_indexes = {}
    chunk_nodes = {}


def _retriever():
    r = PageLevelRetriever.__new__(PageLevelRetriever)
    r.registry = _Reg()
    r._provider = None
    return r


def test_page_score_formula(tmp_storage):
    """avg + min(0.05·n, 0.15) — reference page_retriever.py:186-196."""
    r = _retriever()
    chunks = [
        _chunk("d", 0, 0.8, "c_000_000"),
        _chunk("d", 0, 0.6, "c_000_001"),
        _chunk("d", 1, 0.9, "c_001_000"),
    ]
    pages = r.rank_pages(chunks, top_pages=5)
    by_page = {p.page: p for p in pages}
    assert by_page[0].score == pytest.approx(0.7 + 0.10)
    assert by_page[1].score == pytest.approx(0.9 + 0.05)


def test_page_boost_cap(tmp_storage):
    r = _retriever()
    chunks = [_chunk("d", 0, 0.5, f"c_000_{i:03d}") for i in range(10)]
    pages = r.rank_pages(chunks, top_pages=1)
    assert pages[0].score == pytest.approx(0.5 + 0.15)  # capped at 0.15


def test_table_boost(tmp_storage):
    r = _retriever()
    plain = r.rank_pages([_chunk("d", 0, 0.5)], top_pages=1)[0].score
    boosted = r.rank_pages([_chunk("d", 0, 0.5, table=True)], top_pages=1)[0].score
    assert boosted == pytest.approx(plain * 1.5)


def _ranked(score=0.9):
    return PageRanking(
        doc_id="d",
        page=2,
        score=score,
        chunks=[_chunk("d", 2, score, text="The warranty lasts 24 months.")],
        source_file="handbook.pdf",
        chapter="Policies",
        section="Warranty",
        title="Warranty",
    )


def test_context_header_format():
    ctx = ResponseAssembler(8000).assemble_context([_ranked()])
    assert ctx.startswith("[Page 3 | Policies | Warranty]")
    assert "24 months" in ctx


def test_context_length_budget():
    pages = [
        PageRanking("d", i, 0.9, [
            _chunk("d", i, 0.9, f"c_{i:03d}_000", "x" * 500)
        ]) for i in range(30)
    ]
    ctx = ResponseAssembler(2000).assemble_context(pages)
    assert len(ctx) <= 2000


def test_confidence_thresholds():
    assert estimate_confidence([_ranked(0.9)]) == "high"
    assert estimate_confidence([_ranked(0.7)]) == "medium"
    assert estimate_confidence([_ranked(0.3)]) == "low"
    assert estimate_confidence([]) == "low"


def test_create_response_sources(tmp_storage):
    resp = create_page_aware_response("answer text", [_ranked()])
    src = resp["sources"]["primary_sources"][0]
    assert src["page"] == 3  # 1-based
    assert src["chapter"] == "Policies"
    assert resp["confidence"] == "high"


def test_build_rag_prompt():
    prompt = build_rag_prompt("How long is the warranty?", [_ranked()])
    assert "How long is the warranty?" in prompt
    assert "24 months" in prompt
    assert prompt.index("Context") < prompt.index("Question")
