"""Schema round-trip and tree-accessor tests
(reference behavior: rag/ingest/schemas.py)."""

from intool_rag_tpu.ingest.schemas import (
    Chunk,
    ChunksIndex,
    NodeLevel,
    PageIndex,
    SemanticNode,
    VectorMeta,
    is_valid_chunk_id,
    is_valid_node_id,
    make_chunk_id,
    make_node_id,
)


def _tree() -> PageIndex:
    nodes = [
        SemanticNode("n_000", "Doc", NodeLevel.DOCUMENT, 0, children=["n_001", "n_003"]),
        SemanticNode("n_001", "Ch 1", NodeLevel.CHAPTER, 0, parent_id="n_000", children=["n_002"]),
        SemanticNode("n_002", "Sec 1.1", NodeLevel.SECTION, 1, parent_id="n_001"),
        SemanticNode("n_003", "Ch 2", NodeLevel.CHAPTER, 2, parent_id="n_000"),
    ]
    return PageIndex(doc_id="d1", page_count=3, nodes=nodes)


def test_id_formats():
    assert make_node_id(7) == "n_007"
    assert make_chunk_id(3, 12) == "c_003_012"
    assert is_valid_node_id("n_007")
    assert is_valid_chunk_id("c_003_012")
    assert not is_valid_chunk_id("n_003")
    assert not is_valid_node_id("c_003_012")


def test_tree_accessors():
    pi = _tree()
    assert pi.get_node("n_002").title == "Sec 1.1"
    assert pi.get_parent("n_002").node_id == "n_001"
    assert [c.node_id for c in pi.get_children("n_000")] == ["n_001", "n_003"]
    assert [s.node_id for s in pi.get_siblings("n_001")] == ["n_003"]
    assert [n.node_id for n in pi.ancestry("n_002")] == ["n_000", "n_001", "n_002"]
    assert [n.node_id for n in pi.nodes_for_page(2)] == ["n_003"]


def test_page_index_roundtrip():
    pi = _tree()
    pi2 = PageIndex.from_dict(pi.to_dict())
    assert pi2.doc_id == pi.doc_id
    assert len(pi2.nodes) == 4
    assert pi2.get_node("n_001").level is NodeLevel.CHAPTER


def test_chunks_roundtrip():
    ci = ChunksIndex(
        doc_id="d1",
        chunks=[
            Chunk("c_000_000", "n_001", 0, "hello world", token_estimate=2),
            Chunk("c_001_000", "n_002", 1, "second page text"),
        ],
    )
    ci2 = ChunksIndex.from_dict(ci.to_dict())
    assert len(ci2) == 2
    assert ci2.get("c_001_000").page == 1
    assert ci2.ordered_texts()[0] == "hello world"
    assert [c.chunk_id for c in ci2.chunks_for_page(0)] == ["c_000_000"]


def test_vector_meta():
    vm = VectorMeta(doc_id="d1", dimension=16, count=2,
                    chunk_ids=["c_000_000", "c_001_000"], pages=[0, 1])
    vm2 = VectorMeta.from_dict(vm.to_dict())
    assert vm2.chunk_for_vector(1) == "c_001_000"
    assert vm2.page_for_vector(0) == 0
    assert vm2.chunk_for_vector(5) is None
