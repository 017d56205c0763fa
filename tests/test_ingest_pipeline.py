"""Loader, tree builder and end-to-end ingestion pipeline tests
(offline providers)."""

from pathlib import Path

import pytest

from intool_rag_tpu.exceptions import UnsupportedFormatError
from intool_rag_tpu.ingest.loader import PageBasedLoader
from intool_rag_tpu.ingest.pipeline import IngestionPipeline
from intool_rag_tpu.ingest.schemas import NodeLevel
from intool_rag_tpu.ingest.tree import SemanticTreeBuilder
from intool_rag_tpu.llm.semantic.base import SectionSpec
from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider

from test_pdf import build_minimal_pdf

INVOICES = Path("/root/reference/invoices")

DOC_TEXT = """1. Introduction

This document describes the warranty policy in detail for all products.

1.1 Coverage

The warranty covers manufacturing defects for a period of 24 months.

2. Returns

Items can be returned within 30 days of purchase with a valid receipt.
"""


def test_loader_txt_formfeed(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("page one text\fpage two text")
    pages = PageBasedLoader().load(p)
    assert [pg.page for pg in pages] == [0, 1]
    assert pages[1].raw_content == "page two text"


def test_loader_unsupported(tmp_path):
    p = tmp_path / "doc.docx"
    p.write_bytes(b"zzz")
    with pytest.raises(UnsupportedFormatError):
        PageBasedLoader().load(p)


def test_loader_pdf(tmp_path):
    p = tmp_path / "doc.pdf"
    p.write_bytes(build_minimal_pdf(["alpha page", "beta page"]))
    pages = PageBasedLoader().load(p)
    assert len(pages) == 2
    assert "alpha page" in pages[0].raw_content


def test_tree_builder_hierarchy():
    sections = [
        SectionSpec("Intro", "chapter", 0, "intro summary"),
        SectionSpec("Scope", "section", 0),
        SectionSpec("Details", "subsection", 1),
        SectionSpec("Next Chapter", "chapter", 1),
    ]
    pi = SemanticTreeBuilder().build(
        "d1", {0: "page a", 1: "page b"}, sections=sections, source_file="f.pdf"
    )
    assert pi.nodes[0].level is NodeLevel.DOCUMENT
    by_title = {n.title: n for n in pi.nodes}
    assert by_title["Scope"].parent_id == by_title["Intro"].node_id
    assert by_title["Details"].parent_id == by_title["Scope"].node_id
    # new chapter pops back to root
    assert by_title["Next Chapter"].parent_id == pi.nodes[0].node_id
    assert by_title["Next Chapter"].page_index == 1
    assert pi.get_children(by_title["Intro"].node_id)


def _pipeline(tmp_storage):
    return IngestionPipeline(embedding_provider=HashEmbeddingProvider(128))


def test_pipeline_end_to_end_txt(tmp_storage, tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    p = tmp_path / "handbook.txt"
    p.write_text(DOC_TEXT)
    pipeline = _pipeline(tmp_storage)
    result = pipeline.ingest_file(p, project="p1", doc_id="doc1")
    assert result["success"]
    assert result["chunk_count"] >= 1
    assert result["vectors_indexed"] == result["chunk_count"]
    # artifact quartet exists
    storage = pipeline.storage
    assert storage.load_page_index("doc1").project == "p1"
    chunks = storage.load_chunks("doc1")
    assert len(chunks) == result["chunk_count"]
    emb, meta = storage.load_vectors("doc1")
    assert emb.shape == (result["chunk_count"], 128)
    assert meta.chunk_ids == [c.chunk_id for c in chunks.chunks]
    reset_semantic_analyzer()


def test_pipeline_pdf_end_to_end(tmp_storage, tmp_path, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    p = tmp_path / "doc.pdf"
    p.write_bytes(
        build_minimal_pdf(
            [
                "Chapter One\nThe quick brown fox jumps over the lazy dog. " * 3,
                "Chapter Two\nInvoices are payable within thirty days. " * 3,
            ]
        )
    )
    result = _pipeline(tmp_storage).ingest_file(p, project="p1", doc_id="pdfdoc")
    assert result["success"]
    assert result["page_count"] == 2
    assert result["chunk_count"] >= 2
    reset_semantic_analyzer()


@pytest.mark.skipif(not INVOICES.exists(), reason="reference samples not mounted")
def test_pipeline_real_invoice(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    result = _pipeline(tmp_storage).ingest_file(
        INVOICES / "invoice_Aaron Hawkins_4820.pdf",
        project="invoices",
        doc_id="inv1",
    )
    assert result["success"]
    assert result["chunk_count"] >= 1
    reset_semantic_analyzer()
