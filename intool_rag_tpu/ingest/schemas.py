"""Document data model: semantic nodes, page index, chunks, vector metadata.

Capability parity with the reference's ingest schemas (reference:
rag/ingest/schemas.py:7-357): ``NodeLevel``, ``SemanticNode``,
``PageIndex`` (flat node list with tree accessors), ``Chunk``,
``ChunksIndex`` and the vector↔chunk mapping (the reference calls it
``FAISSMeta``; here it is ``VectorMeta`` since the index is a TPU-native
array index, not FAISS).

IDs follow the reference formats so stored corpora are interoperable at
the JSON level: chunk ids ``c_{page:03d}_{index:03d}``
(reference: rag/ingest/node_aware_chunker.py:143-145), node ids
``n_{ordinal:03d}``.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import re
from pathlib import Path
from typing import Any, Iterable


class NodeLevel(str, enum.Enum):
    """Hierarchy levels of the semantic document tree
    (reference: rag/ingest/schemas.py:7-13)."""

    DOCUMENT = "document"
    CHAPTER = "chapter"
    SECTION = "section"
    SUBSECTION = "subsection"
    PARAGRAPH = "paragraph"

    @property
    def depth(self) -> int:
        return _LEVEL_DEPTH[self]


_LEVEL_DEPTH = {
    NodeLevel.DOCUMENT: 0,
    NodeLevel.CHAPTER: 1,
    NodeLevel.SECTION: 2,
    NodeLevel.SUBSECTION: 3,
    NodeLevel.PARAGRAPH: 4,
}

_NODE_ID_RE = re.compile(r"^n_\d{3,}$")
_CHUNK_ID_RE = re.compile(r"^c_\d{3,}_\d{3,}$")


def is_valid_node_id(node_id: str) -> bool:
    return bool(_NODE_ID_RE.match(node_id))


def is_valid_chunk_id(chunk_id: str) -> bool:
    return bool(_CHUNK_ID_RE.match(chunk_id))


def make_node_id(ordinal: int) -> str:
    return f"n_{ordinal:03d}"


def make_chunk_id(page: int, index: int) -> str:
    return f"c_{page:03d}_{index:03d}"


@dataclasses.dataclass
class SemanticNode:
    """One node of the semantic tree (reference: rag/ingest/schemas.py:16-70)."""

    node_id: str
    title: str
    level: NodeLevel
    page_index: int
    summary: str = ""
    parent_id: str | None = None
    children: list[str] = dataclasses.field(default_factory=list)
    char_start: int = 0
    char_end: int = 0
    token_estimate: int = 0

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["level"] = self.level.value
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SemanticNode":
        d = dict(d)
        d["level"] = NodeLevel(d["level"])
        return cls(**d)


@dataclasses.dataclass
class PageIndex:
    """Flat node list with tree accessors
    (reference: rag/ingest/schemas.py:73-153)."""

    doc_id: str
    source_file: str = ""
    project: str = ""
    language: str = "en"
    page_count: int = 0
    nodes: list[SemanticNode] = dataclasses.field(default_factory=list)

    def __post_init__(self) -> None:
        self._by_id = {n.node_id: n for n in self.nodes}

    def get_node(self, node_id: str) -> SemanticNode | None:
        return self._by_id.get(node_id)

    def get_children(self, node_id: str) -> list[SemanticNode]:
        node = self.get_node(node_id)
        if node is None:
            return []
        return [c for cid in node.children if (c := self.get_node(cid)) is not None]

    def get_parent(self, node_id: str) -> SemanticNode | None:
        node = self.get_node(node_id)
        if node is None or node.parent_id is None:
            return None
        return self.get_node(node.parent_id)

    def get_siblings(self, node_id: str) -> list[SemanticNode]:
        node = self.get_node(node_id)
        if node is None:
            return []
        parent = self.get_parent(node_id)
        if parent is None:
            return [n for n in self.nodes if n.parent_id is None and n is not node]
        return [c for c in self.get_children(parent.node_id) if c.node_id != node_id]

    def nodes_for_page(self, page: int) -> list[SemanticNode]:
        return [n for n in self.nodes if n.page_index == page]

    def ancestry(self, node_id: str) -> list[SemanticNode]:
        """Path from root-most ancestor down to the node itself."""
        path: list[SemanticNode] = []
        node = self.get_node(node_id)
        seen: set[str] = set()
        while node is not None and node.node_id not in seen:
            seen.add(node.node_id)
            path.append(node)
            node = self.get_parent(node.node_id)
        return list(reversed(path))

    def add_node(self, node: SemanticNode) -> None:
        self.nodes.append(node)
        self._by_id[node.node_id] = node

    def to_dict(self) -> dict[str, Any]:
        return {
            "doc_id": self.doc_id,
            "source_file": self.source_file,
            "project": self.project,
            "language": self.language,
            "page_count": self.page_count,
            "nodes": [n.to_dict() for n in self.nodes],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PageIndex":
        return cls(
            doc_id=d["doc_id"],
            source_file=d.get("source_file", ""),
            project=d.get("project", ""),
            language=d.get("language", "en"),
            page_count=d.get("page_count", 0),
            nodes=[SemanticNode.from_dict(n) for n in d.get("nodes", [])],
        )


@dataclasses.dataclass
class Chunk:
    """A retrieval unit bound to a page and a semantic node
    (reference: rag/ingest/schemas.py:155-195)."""

    chunk_id: str
    node_id: str
    page: int
    text: str
    char_start: int = 0
    char_end: int = 0
    seq_index: int = 0
    token_estimate: int = 0
    embedding_id: int | None = None
    has_table: bool = False
    has_structured_data: bool = False

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Chunk":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class ChunksIndex:
    """Ordered chunk collection for one document
    (reference: rag/ingest/schemas.py:198-241)."""

    doc_id: str
    chunks: list[Chunk] = dataclasses.field(default_factory=list)

    def __post_init__(self) -> None:
        self._by_id = {c.chunk_id: c for c in self.chunks}

    def get(self, chunk_id: str) -> Chunk | None:
        return self._by_id.get(chunk_id)

    def add(self, chunk: Chunk) -> None:
        self.chunks.append(chunk)
        self._by_id[chunk.chunk_id] = chunk

    def ordered_texts(self) -> list[str]:
        return [c.text for c in self.chunks]

    def chunks_for_page(self, page: int) -> list[Chunk]:
        return [c for c in self.chunks if c.page == page]

    def __len__(self) -> int:
        return len(self.chunks)

    def __iter__(self) -> Iterable[Chunk]:
        return iter(self.chunks)

    def to_dict(self) -> dict[str, Any]:
        return {"doc_id": self.doc_id, "chunks": [c.to_dict() for c in self.chunks]}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ChunksIndex":
        return cls(
            doc_id=d["doc_id"],
            chunks=[Chunk.from_dict(c) for c in d.get("chunks", [])],
        )


@dataclasses.dataclass
class VectorMeta:
    """vector_id ↔ chunk_id mapping plus page lookup (the reference's
    ``FAISSMeta`` — rag/ingest/schemas.py:243-295). vector_id is the row
    index into the document's embedding matrix."""

    doc_id: str
    model: str = ""
    dimension: int = 0
    count: int = 0
    chunk_ids: list[str] = dataclasses.field(default_factory=list)  # row -> chunk_id
    pages: list[int] = dataclasses.field(default_factory=list)  # row -> page

    def chunk_for_vector(self, vector_id: int) -> str | None:
        if 0 <= vector_id < len(self.chunk_ids):
            return self.chunk_ids[vector_id]
        return None

    def page_for_vector(self, vector_id: int) -> int | None:
        if 0 <= vector_id < len(self.pages):
            return self.pages[vector_id]
        return None

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "VectorMeta":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# --- JSON save/load helpers (reference: rag/ingest/schemas.py:321-357) ---


def save_json(obj: Any, path: Path | str) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = obj.to_dict() if hasattr(obj, "to_dict") else obj
    path.write_text(json.dumps(data, ensure_ascii=False, indent=2), encoding="utf-8")


def load_json(path: Path | str) -> Any:
    return json.loads(Path(path).read_text(encoding="utf-8"))
