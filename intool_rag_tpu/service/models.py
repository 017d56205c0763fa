"""Request/response models (reference: rag/routers/page_aware_v2.py:35-78,
same field names and shapes so clients are drop-in compatible)."""

from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel


class IngestResponse(BaseModel):
    success: bool
    doc_id: str
    source_file: str
    project: str
    total_pages: int
    total_chunks: int
    vectors_indexed: int
    processing_time_seconds: float


class QueryRequest(BaseModel):
    question: str
    project: Optional[str] = None
    top_pages: int = 5
    max_context_length: int = 8000
    stream: bool = False  # SSE token streaming on /query


class SourceReference(BaseModel):
    page: int
    chapter: Optional[str] = None
    section: Optional[str] = None
    subsection: Optional[str] = None
    title: Optional[str] = None
    source_file: Optional[str] = None
    relevance_score: float


class QueryResponse(BaseModel):
    answer: str
    sources: List[SourceReference]
    confidence: str  # "high" | "medium" | "low"


class DocumentInfo(BaseModel):
    doc_id: str
    source_file: str = ""
    project: str = ""
    language: str = "en"
    page_count: int = 0
    chunk_count: int = 0
    vectors_indexed: int = 0
    embedding_model: str = ""
    dimension: int = 0


class HealthResponse(BaseModel):
    status: str
    documents: int
    chunks: int
    backend: str
    version: str
