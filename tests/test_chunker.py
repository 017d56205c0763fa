"""Chunker behavior tests
(reference behavior: rag/ingest/node_aware_chunker.py)."""

from intool_rag_tpu.ingest.chunker import (
    ChunkerConfig,
    ChunksBuilder,
    NodeAwareChunker,
    estimate_tokens,
)
from intool_rag_tpu.ingest.schemas import NodeLevel, PageIndex, SemanticNode


def test_token_estimate_matches_reference_heuristic():
    # reference: words / 0.75 (node_aware_chunker.py:121-124)
    assert estimate_tokens("one two three") == int(3 / 0.75)


def test_greedy_packing_respects_max():
    cfg = ChunkerConfig(max_chars=100, min_chars=10, target_chars=60)
    chunker = NodeAwareChunker(cfg)
    paras = "\n\n".join(["word " * 8] * 10)  # 40-char paragraphs
    chunks = chunker.chunk_text(paras)
    assert all(len(c) <= 100 for c in chunks)
    assert len(chunks) > 1
    # no content lost
    assert sum(len(c.replace("\n\n", " ").split()) for c in chunks) == 80


def test_oversized_paragraph_split():
    cfg = ChunkerConfig(max_chars=100, min_chars=10, target_chars=60)
    chunker = NodeAwareChunker(cfg)
    text = "This is a sentence. " * 20  # one paragraph, 400 chars
    chunks = chunker.chunk_text(text)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).count("sentence") == 20


def test_small_tail_merged():
    cfg = ChunkerConfig(max_chars=200, min_chars=50, target_chars=100)
    chunker = NodeAwareChunker(cfg)
    chunks = chunker.chunk_text(("alpha " * 20).strip() + "\n\ntiny")
    assert chunks[-1].endswith("tiny")
    assert len(chunks) == 1 or len(chunks[-1]) >= 50


def test_builder_ids_and_node_binding():
    nodes = [
        SemanticNode("n_000", "Introduction", NodeLevel.CHAPTER, 0),
        SemanticNode("n_001", "Methods", NodeLevel.CHAPTER, 0),
    ]
    pi = PageIndex(doc_id="d", page_count=1, nodes=nodes)
    page_text = (
        "Introduction\n\nThis document introduces the topic in some detail.\n\n"
        "Methods\n\nWe describe the experimental methods used in this work."
    )
    builder = ChunksBuilder(ChunkerConfig(max_chars=200, min_chars=10, target_chars=80))
    chunks = builder.build_chunks({0: page_text}, pi)
    assert chunks[0].chunk_id == "c_000_000"
    assert all(c.page == 0 for c in chunks)
    # real node binding: the Methods text must bind to n_001, not the page anchor
    methods_chunks = [c for c in chunks if "experimental methods" in c.text]
    assert methods_chunks and all(c.node_id == "n_001" for c in methods_chunks)


def test_table_detection():
    builder = ChunksBuilder()
    pi = PageIndex(doc_id="d", page_count=1, nodes=[])
    text = "| col_a | col_b |\n| 1 | 2 |\n\n" + ("Plain paragraph text here. " * 5)
    chunks = builder.build_chunks({0: text}, pi)
    assert any(c.has_table for c in chunks)
