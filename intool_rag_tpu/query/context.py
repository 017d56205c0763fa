"""Node-level context building with query-type strategies
(reference: rag/query/context_builder.py:64-499).

Strategies:
- SIMPLE      — the matched nodes' text, relevance-ordered.
- HIERARCHY   — adds parent (relevance 0.7) and sibling (0.6) blocks
  around each primary node (context_builder.py:151-221).
- COMPARISON  — groups nodes pairwise for compare-style questions.

Query-type heuristics (compare/define/how-why → COMPARISON / DEFINITION /
ANALYTICAL, context_builder.py:91-110) select the strategy; a token
budget truncates with primary + parent always kept
(context_builder.py:299-357). Token estimate = words/0.75 (the
reference's heuristic)."""

from __future__ import annotations

import dataclasses
import enum
import re

from ..ingest.chunker import estimate_tokens
from ..ingest.schemas import PageIndex, SemanticNode


class QueryType(str, enum.Enum):
    SIMPLE = "simple"
    DEFINITION = "definition"
    ANALYTICAL = "analytical"
    COMPARISON = "comparison"


_COMPARE = re.compile(r"\b(compare|versus|vs\.?|difference|differ|contrast)\b", re.I)
_DEFINE = re.compile(r"\b(what is|what are|define|definition of|meaning of)\b", re.I)
_ANALYTICAL = re.compile(r"\b(how|why|explain|analy[sz]e)\b", re.I)


def classify_query_type(query: str) -> QueryType:
    """(reference: context_builder.py:91-110)"""
    if _COMPARE.search(query):
        return QueryType.COMPARISON
    if _DEFINE.search(query):
        return QueryType.DEFINITION
    if _ANALYTICAL.search(query):
        return QueryType.ANALYTICAL
    return QueryType.SIMPLE


@dataclasses.dataclass
class ContextBlock:
    node_id: str
    title: str
    text: str
    relevance: float
    role: str  # primary | parent | sibling

    @property
    def token_estimate(self) -> int:
        return estimate_tokens(self.text)


class ContextBuilder:
    """Builds ordered context blocks for a set of matched nodes."""

    def __init__(self, page_index: PageIndex, node_texts: dict[str, str]) -> None:
        self.page_index = page_index
        self.node_texts = node_texts

    def _block(self, node: SemanticNode, relevance: float, role: str) -> ContextBlock | None:
        text = self.node_texts.get(node.node_id, node.summary)
        if not text:
            return None
        return ContextBlock(node.node_id, node.title, text, relevance, role)

    def build_simple(self, matches: list[tuple[str, float]]) -> list[ContextBlock]:
        """(reference: context_builder.py:116-149)"""
        blocks = []
        for node_id, rel in sorted(matches, key=lambda m: -m[1]):
            node = self.page_index.get_node(node_id)
            if node and (b := self._block(node, rel, "primary")):
                blocks.append(b)
        return blocks

    def build_hierarchy(self, matches: list[tuple[str, float]]) -> list[ContextBlock]:
        """Primary + parent (0.7·rel) + siblings (0.6·rel)
        (reference: context_builder.py:151-221)."""
        blocks = self.build_simple(matches)
        seen = {b.node_id for b in blocks}
        extra: list[ContextBlock] = []
        for node_id, rel in matches:
            parent = self.page_index.get_parent(node_id)
            if parent and parent.node_id not in seen:
                if b := self._block(parent, rel * 0.7, "parent"):
                    extra.append(b)
                    seen.add(parent.node_id)
            for sib in self.page_index.get_siblings(node_id)[:2]:
                if sib.node_id not in seen:
                    if b := self._block(sib, rel * 0.6, "sibling"):
                        extra.append(b)
                        seen.add(sib.node_id)
        return blocks + extra

    def build_comparison(self, matches: list[tuple[str, float]]) -> list[ContextBlock]:
        """Interleave the two strongest branches
        (reference: context_builder.py:223-256)."""
        blocks = self.build_hierarchy(matches)
        primaries = [b for b in blocks if b.role == "primary"]
        others = [b for b in blocks if b.role != "primary"]
        return primaries[:2] + others + primaries[2:]

    # ---------------- budget ----------------

    @staticmethod
    def apply_token_budget(
        blocks: list[ContextBlock], budget: int
    ) -> list[ContextBlock]:
        """Keep primary + parent first, trim the rest
        (reference: context_builder.py:299-357)."""
        must_keep = [b for b in blocks if b.role in ("primary", "parent")]
        optional = [b for b in blocks if b.role not in ("primary", "parent")]
        # primary + parent are kept unconditionally (reference semantics,
        # context_builder.py:299-357); only optional blocks compete for
        # the remaining budget
        kept: list[ContextBlock] = list(must_keep)
        used = sum(b.token_estimate for b in must_keep)
        for block in sorted(optional, key=lambda b: -b.relevance):
            tokens = block.token_estimate
            if used + tokens > budget:
                continue
            kept.append(block)
            used += tokens
        order = {id(b): i for i, b in enumerate(blocks)}
        kept.sort(key=lambda b: order[id(b)])
        return kept

    # ---------------- façade ----------------

    def build_adaptive(
        self,
        query: str,
        matches: list[tuple[str, float]],
        *,
        token_budget: int = 3000,
    ) -> tuple[list[ContextBlock], QueryType]:
        """(reference: build_context_adaptive, context_builder.py:440-499)"""
        qtype = classify_query_type(query)
        if qtype is QueryType.COMPARISON:
            blocks = self.build_comparison(matches)
        elif qtype in (QueryType.ANALYTICAL, QueryType.DEFINITION):
            blocks = self.build_hierarchy(matches)
        else:
            blocks = self.build_simple(matches)
        return self.apply_token_budget(blocks, token_budget), qtype


def format_blocks(blocks: list[ContextBlock]) -> str:
    """LLM-ready formatting with role-tagged headers
    (reference: context_builder.py:377-434)."""
    out = []
    for b in blocks:
        tag = "" if b.role == "primary" else f" ({b.role})"
        out.append(f"[{b.title}{tag}]\n{b.text}")
    return "\n\n".join(out)
