"""Node-level context builder, DI container, OCR utils tests."""

import numpy as np

from intool_rag_tpu.core import get_container, reset_container
from intool_rag_tpu.ingest.schemas import NodeLevel, PageIndex, SemanticNode
from intool_rag_tpu.ocr.postprocess import TextBox
from intool_rag_tpu.ocr.utils import (
    load_image,
    result_to_json,
    visualize_result,
    word_boxes_from_ctc,
)
from intool_rag_tpu.query.context import (
    ContextBuilder,
    QueryType,
    classify_query_type,
    format_blocks,
)


def _tree():
    nodes = [
        SemanticNode("n_000", "Doc", NodeLevel.DOCUMENT, 0, children=["n_001", "n_004"]),
        SemanticNode("n_001", "Policies", NodeLevel.CHAPTER, 0, parent_id="n_000",
                     children=["n_002", "n_003"]),
        SemanticNode("n_002", "Warranty", NodeLevel.SECTION, 0, parent_id="n_001"),
        SemanticNode("n_003", "Returns", NodeLevel.SECTION, 1, parent_id="n_001"),
        SemanticNode("n_004", "Appendix", NodeLevel.CHAPTER, 2, parent_id="n_000"),
    ]
    pi = PageIndex(doc_id="d", page_count=3, nodes=nodes)
    texts = {
        "n_001": "Policies chapter text " * 5,
        "n_002": "Warranty is 24 months " * 5,
        "n_003": "Returns within 30 days " * 5,
        "n_004": "Appendix content " * 5,
    }
    return pi, texts


def test_query_type_classification():
    assert classify_query_type("compare A versus B") is QueryType.COMPARISON
    assert classify_query_type("what is a warranty?") is QueryType.DEFINITION
    assert classify_query_type("how does it work") is QueryType.ANALYTICAL
    assert classify_query_type("warranty period") is QueryType.SIMPLE


def test_hierarchy_strategy_adds_parent_and_sibling():
    pi, texts = _tree()
    builder = ContextBuilder(pi, texts)
    blocks, qtype = builder.build_adaptive(
        "how long is the warranty?", [("n_002", 0.9)], token_budget=3000
    )
    roles = {b.node_id: b.role for b in blocks}
    assert roles["n_002"] == "primary"
    assert roles["n_001"] == "parent"
    assert roles["n_003"] == "sibling"
    by_id = {b.node_id: b for b in blocks}
    assert by_id["n_001"].relevance == 0.9 * 0.7
    assert by_id["n_003"].relevance == 0.9 * 0.6


def test_token_budget_keeps_primary_and_parent():
    pi, texts = _tree()
    builder = ContextBuilder(pi, texts)
    blocks, _ = builder.build_adaptive(
        "explain the warranty", [("n_002", 0.9)], token_budget=30
    )
    roles = [b.role for b in blocks]
    assert "primary" in roles and "parent" in roles
    assert "sibling" not in roles  # trimmed by the budget


def test_format_blocks():
    pi, texts = _tree()
    blocks, _ = ContextBuilder(pi, texts).build_adaptive(
        "what is the warranty?", [("n_002", 0.9)]
    )
    out = format_blocks(blocks)
    assert out.startswith("[Warranty]")
    assert "(parent)" in out


def test_container_lazy_and_shutdown(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    monkeypatch.setenv("EMBEDDING_PROVIDER", "hash")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.embeddings.factory import reset_embedding_provider
    from intool_rag_tpu.llm.factory import reset_llm

    config_mod.reset_config()
    reset_llm()
    reset_embedding_provider()
    reset_container()
    c = get_container()
    assert c.get_llm_provider().is_ready()
    assert c.get_embedding_provider().dimension > 0
    assert get_container() is c
    reset_container()
    assert get_container() is not c
    reset_llm()
    reset_embedding_provider()
    reset_container()


# ---------------- OCR utils ----------------


def test_load_image_formats(tmp_path):
    arr = np.zeros((10, 12), np.uint8)
    out = load_image(arr)
    assert out.shape == (10, 12, 3) and out.dtype == np.uint8
    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    assert load_image(p).shape == (8, 8, 3)
    assert load_image(p.read_bytes()).shape == (8, 8, 3)


def test_word_boxes_from_ctc():
    charset = "ab "
    blank = 3
    # columns: a a _ space b b  → words "a" and "b"
    seq = [0, 0, blank, 2, 1, 1]
    logits = np.full((len(seq), 4), -10.0, np.float32)
    for t, c in enumerate(seq):
        logits[t, c] = 10.0
    box = TextBox(100, 10, 160, 30, 0.9)  # width 60, 6 columns → 10px each
    words = word_boxes_from_ctc(box, logits, charset)
    assert [w for _, w in words] == ["a", "b"]
    (b1, _), (b2, _) = words
    # "a" emits over columns 0-1 (repeat frames extend the span), "b" 4-5
    assert b1.x0 == 100 and b1.x1 == 120
    assert b2.x0 == 140 and b2.x1 == 160


def test_visualize_and_json():
    from intool_rag_tpu.ocr.pipeline import OCRLine, OCRResult

    result = OCRResult(
        lines=[OCRLine(TextBox(2, 2, 20, 12, 0.9), "hi", 0.88)], elapse={"det": 0.1}
    )
    img = visualize_result(np.full((32, 32, 3), 255, np.uint8), result)
    assert img.shape == (32, 32, 3)
    assert (img != 255).any()  # something was drawn
    data = result_to_json(result)
    assert '"hi"' in data and '"box": [2, 2, 20, 12]' in data
