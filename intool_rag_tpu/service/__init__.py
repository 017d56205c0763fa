"""HTTP service exposing the five reference endpoints
(reference: rag/routers/page_aware_v2.py): POST /ingest, POST /query,
GET /documents, GET /documents/{doc_id}, GET /health.

Framework-free (fastapi/uvicorn are not available in this environment):
a threaded stdlib http.server front end over a plain router object that
is also directly callable in tests.
"""

from .app import RAGService  # noqa: F401
