"""Query pipeline: page-level retrieval, context assembly, response
formatting with citations (reference: rag/query/ — SURVEY.md §2.3)."""
