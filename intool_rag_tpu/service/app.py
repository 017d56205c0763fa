"""Framework-free router implementing the five endpoints
(reference: rag/routers/page_aware_v2.py:80-293). Directly callable in
tests; served over HTTP by service/http.py."""

from __future__ import annotations

import time
import uuid
from urllib.parse import parse_qs, urlparse

from .. import __version__
from ..config import get_config
from ..exceptions import IndexNotFoundError, RAGError
from ..index.registry import CorpusRegistry
from ..ingest.pipeline import IngestionPipeline
from ..llm.factory import get_llm
from ..logging import get_logger
from ..observability import Metrics, trace_phase
from ..query.response import build_rag_prompt, create_page_aware_response
from ..query.retriever import PageLevelRetriever
from ..storage.cache import QueryResultCache
from ..tasks import TaskQueue
from .models import (
    DocumentInfo,
    HealthResponse,
    IngestResponse,
    QueryRequest,
    QueryResponse,
    SourceReference,
)
from .multipart import parse_multipart

logger = get_logger(__name__)


class HTTPError(Exception):
    def __init__(self, status: int, detail: str) -> None:
        super().__init__(detail)
        self.status = status
        self.detail = detail


class RAGService:
    """The application object: routes requests to pipeline/query logic."""

    def __init__(self, registry: CorpusRegistry | None = None, llm=None, provider=None) -> None:
        from ..backend import ensure_backend

        logger.info("compute backend: %s", ensure_backend())
        self.registry = registry or CorpusRegistry()
        self.registry.load_all()  # startup preload (reference: main.py:25-31)
        self._llm = llm
        from ..llm.reranker_factory import get_reranker

        if get_config().OCR_ENABLED:
            # wire the scanned-page fallback (the reference's equivalent
            # hook is dead code — SURVEY.md §0)
            from ..ingest.loader import register_ocr_engine
            from ..ocr.pdf_ocr import PDFOCRBridge

            register_ocr_engine(PDFOCRBridge())
            logger.info("OCR fallback registered")
        self.pipeline = IngestionPipeline(
            storage=self.registry.storage, embedding_provider=provider
        )
        self.retriever = PageLevelRetriever(
            self.registry, provider=provider, reranker=get_reranker()
        )
        self.metrics = Metrics()  # per-service (not the process global)
        self.tasks = TaskQueue(workers=1)
        cfg = get_config()
        self.query_cache = QueryResultCache() if cfg.CACHE_QUERY_RESULTS else None
        self._provider = provider
        self._agent = None
        # micro-batching: concurrent queries share one device program
        from .batcher import QueryBatcher

        self.batcher = (
            QueryBatcher(self.retriever.retrieve_chunks_batch)
            if cfg.QUERY_MAX_BATCH > 1
            else None
        )

    @property
    def llm(self):
        if self._llm is None:
            self._llm = get_llm()
        return self._llm

    # ---------------- dispatch ----------------

    def handle(
        self,
        method: str,
        path: str,
        body: bytes = b"",
        content_type: str = "",
    ) -> tuple[int, dict]:
        parsed = urlparse(path)
        route = parsed.path.rstrip("/") or "/"
        params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        try:
            if method == "POST" and route == "/ingest":
                return 200, self.ingest(params, body, content_type)
            if method == "POST" and route == "/query":
                return 200, self.query(body)
            if method == "POST" and route == "/search":
                return 200, self.search(body)
            if method == "GET" and route == "/documents":
                return 200, self.list_documents()
            if method == "GET" and route.startswith("/documents/"):
                return 200, self.document_detail(route.split("/", 2)[2])
            if method == "GET" and route == "/health":
                return 200, self.health()
            if method == "GET" and route == "/metrics":
                return 200, self.metrics_snapshot()
            if method == "POST" and route == "/agent/query":
                return 200, self.agent_query(body)
            if method == "GET" and route == "/agent/health":
                return 200, {"status": "ok", "pipeline": "page-aware-agent"}
            if method == "GET" and route == "/jobs":
                return 200, {"jobs": self.tasks.list_jobs()}
            if method == "POST" and route == "/debug/trace":
                return 200, self.debug_trace(body)
            if method == "GET" and route.startswith("/jobs/"):
                return 200, self.job_detail(route.split("/", 2)[2])
            if method == "DELETE" and route.startswith("/documents/"):
                return 200, self.delete_document(route.split("/", 2)[2])
            raise HTTPError(404, f"no route {method} {route}")
        except HTTPError as exc:
            return exc.status, {"detail": exc.detail}
        except RAGError as exc:
            logger.error("request failed: %s", exc)
            return 400, {"detail": str(exc)}
        except Exception as exc:  # mirror the reference's 500 behavior
            logger.exception("internal error")
            return 500, {"detail": str(exc)}

    # ---------------- endpoints ----------------

    def ingest(self, params: dict, body: bytes, content_type: str) -> dict:
        """(reference: routers/page_aware_v2.py:80-139)"""
        project = params.get("project")
        if not project:
            raise HTTPError(400, "query parameter 'project' is required")
        language = params.get("language", "en")
        doc_id = params.get("doc_id") or str(uuid.uuid4())
        if "multipart" not in content_type:
            raise HTTPError(400, "expected multipart/form-data file upload")
        try:
            _, files = parse_multipart(body, content_type)
        except ValueError as exc:
            raise HTTPError(400, str(exc)) from exc
        if not files:
            raise HTTPError(400, "no file in upload")
        upload = files[0]
        cfg = get_config()
        cfg.ensure_dirs()
        filepath = cfg.UPLOAD_DIR / f"{doc_id}_{upload.filename}"
        filepath.write_bytes(upload.data)
        self.metrics.inc("ingest_requests")

        if params.get("mode") == "async":
            # non-blocking ingest via the background queue (the
            # reference's intended-but-dead AsyncTaskQueue behavior)
            job = self.tasks.submit(
                "ingest",
                lambda: self._do_ingest(
                    filepath, project, doc_id, upload.filename, language
                ),
            )
            return {"job_id": job.job_id, "status": job.status, "doc_id": doc_id}

        start = time.time()
        with trace_phase("ingest", self.metrics):
            result = self._do_ingest(
                filepath, project, doc_id, upload.filename, language
            )
        return IngestResponse(
            success=result["success"],
            doc_id=doc_id,
            source_file=upload.filename,
            project=project,
            total_pages=result["page_count"],
            total_chunks=result["chunk_count"],
            vectors_indexed=result["vectors_indexed"],
            processing_time_seconds=round(time.time() - start, 3),
        ).model_dump()

    def _do_ingest(self, filepath, project, doc_id, filename, language) -> dict:
        result = self.pipeline.ingest_file(
            filepath,
            project=project,
            doc_id=doc_id,
            source_filename=filename,
            language=language,
        )
        self.registry.add_document(doc_id)
        return result

    def job_detail(self, job_id: str) -> dict:
        job = self.tasks.get(job_id)
        if job is None:
            raise HTTPError(404, f"job {job_id} not found")
        return job.to_dict()

    def agent_query(self, body: bytes) -> dict:
        """11-step agent path (reference: rag/agent/api.py:19-127 — which
        was never mounted; mounted and working here)."""
        try:
            request = QueryRequest.model_validate_json(body or b"{}")
        except Exception as exc:
            raise HTTPError(400, f"invalid agent query: {exc}") from exc
        if self._agent is None:
            from ..agent import PageAwareAgent

            self._agent = PageAwareAgent(
                self.registry, llm=self.llm, provider=self._provider
            )
        self.metrics.inc("agent_requests")
        with trace_phase("agent.query", self.metrics):
            return self._agent.query(request.question, project=request.project)

    def debug_trace(self, body: bytes) -> dict:
        """Capture a jax.profiler device trace for N seconds into
        STORAGE_DIR/traces (viewable in TensorBoard/Perfetto)."""
        import json as _json
        import time as _time

        from ..observability import start_device_trace, stop_device_trace

        try:
            seconds = float(_json.loads(body or b"{}").get("seconds", 3))
        except Exception as exc:
            raise HTTPError(400, f"invalid trace request: {exc}") from exc
        seconds = min(max(seconds, 0.5), 60.0)
        cfg = get_config()
        trace_dir = str(cfg.STORAGE_DIR / "traces")
        start_device_trace(trace_dir)
        _time.sleep(seconds)
        stop_device_trace()
        return {"trace_dir": trace_dir, "seconds": seconds}

    def metrics_snapshot(self) -> dict:
        snap = self.metrics.snapshot()
        snap["corpus"] = self.registry.stats()
        if self.query_cache is not None:
            snap["query_cache"] = {
                "hits": self.query_cache.hits,
                "misses": self.query_cache.misses,
            }
        if self.batcher is not None:
            snap["batcher"] = {
                "batches_run": self.batcher.batches_run,
                "requests_served": self.batcher.requests_served,
            }
        # process-global counters (LLM wave serving, trainer phases)
        # surface under their own key so per-service numbers stay clean
        from ..observability import get_metrics

        g = get_metrics().snapshot()
        if g["counters"] or g["latency_s"]:
            snap["process"] = g
        return snap

    def query(self, body: bytes) -> dict:
        """(reference: routers/page_aware_v2.py:142-217)"""
        try:
            request = QueryRequest.model_validate_json(body or b"{}")
        except Exception as exc:
            raise HTTPError(400, f"invalid query request: {exc}") from exc
        self.metrics.inc("query_requests")
        cache_params = f"{request.top_pages}|{request.max_context_length}"
        if self.query_cache is not None and not request.stream:
            cached = self.query_cache.get(
                request.question, request.project or "", cache_params,
                self.registry.version,
            )
            if cached is not None:
                self.metrics.inc("query_cache_hits")
                return cached
        with trace_phase("query.retrieve", self.metrics):
            if self.batcher is not None:
                chunks = self.batcher.submit(request.question, request.project)
                ranked = (
                    self.retriever.rank_pages(chunks, request.top_pages)
                    if chunks else []
                )
            else:
                ranked = self.retriever.retrieve_and_rank_pages(
                    request.question, project=request.project,
                    top_pages=request.top_pages,
                )
        if not ranked:
            return QueryResponse(
                answer="I could not find relevant information to answer your question.",
                sources=[],
                confidence="low",
            ).model_dump()
        prompt = build_rag_prompt(request.question, ranked, request.max_context_length)
        if request.stream:
            return {"__stream__": self._stream_answer(request, prompt, ranked)}
        start = time.time()
        with trace_phase("query.generate", self.metrics):
            answer = self.llm.generate(prompt)
        logger.info("LLM generation took %.2fs", time.time() - start)
        response = create_page_aware_response(answer, ranked)
        result = QueryResponse(
            answer=answer,
            sources=[
                SourceReference(**src) for src in response["sources"]["primary_sources"]
            ],
            confidence=response["confidence"],
        ).model_dump()
        if self.query_cache is not None:
            self.query_cache.put(
                request.question, request.project or "", cache_params,
                self.registry.version, result,
            )
        return result

    def search(self, body: bytes) -> dict:
        """Raw retrieval (no LLM): hybrid top-k chunks with scores and
        identities — the engine surface for programmatic consumers."""
        try:
            request = QueryRequest.model_validate_json(body or b"{}")
        except Exception as exc:
            raise HTTPError(400, f"invalid search request: {exc}") from exc
        self.metrics.inc("search_requests")
        with trace_phase("search", self.metrics):
            # concurrent searches coalesce into one batched device
            # program exactly like /query — without this every handler
            # thread runs its own retrieval and they serialize on the
            # device (measured: /search p50 2.5 s at concurrency 8 on
            # the TPU tunnel vs ~one dispatch per WINDOW_MS batched)
            if self.batcher is not None:
                chunks = self.batcher.submit(request.question, request.project)
            else:
                chunks = self.retriever.retrieve_chunks(
                    request.question, project=request.project
                )
        return {
            "hits": [
                {
                    "doc_id": c.doc_id,
                    "chunk_id": c.chunk_id,
                    "page": c.page + 1,
                    "score": round(c.score, 4),
                    "text": c.text,
                }
                for c in chunks
            ],
            "total": len(chunks),
        }

    def _stream_answer(self, request, prompt: str, ranked):
        """SSE events: sources first, then token deltas, then done
        (exposes the BaseLLM.generate_stream capability —
        reference: rag/llm/base.py — over HTTP)."""
        import json as _json

        response = create_page_aware_response("", ranked)

        def events():
            yield "event: sources\ndata: " + _json.dumps(
                response["sources"]["primary_sources"]
            ) + "\n\n"
            parts = []
            try:
                for chunk in self.llm.generate_stream(prompt):
                    parts.append(chunk)
                    yield "event: token\ndata: " + _json.dumps({"text": chunk}) + "\n\n"
            except Exception as exc:
                yield "event: error\ndata: " + _json.dumps({"detail": str(exc)}) + "\n\n"
                return
            final = create_page_aware_response("".join(parts), ranked)
            yield "event: done\ndata: " + _json.dumps(
                {"confidence": final["confidence"]}
            ) + "\n\n"

        return events()

    def list_documents(self) -> dict:
        """(reference: routers/page_aware_v2.py:220-241)"""
        docs = [DocumentInfo(**info).model_dump() for info in self.registry.list_documents()]
        return {"documents": docs, "total": len(docs)}

    def document_detail(self, doc_id: str) -> dict:
        """(reference: routers/page_aware_v2.py:244-283 — which is broken
        there via a nonexistent import; functional here)"""
        try:
            info = self.registry.storage.document_info(doc_id)
        except IndexNotFoundError as exc:
            raise HTTPError(404, f"document {doc_id} not found") from exc
        page_index = self.registry.storage.load_page_index(doc_id)
        info["nodes"] = [n.to_dict() for n in page_index.nodes]
        return info

    def delete_document(self, doc_id: str) -> dict:
        removed = self.registry.remove_document(doc_id)
        if not removed:
            raise HTTPError(404, f"document {doc_id} not found")
        return {"deleted": doc_id}

    def health(self) -> dict:
        """(reference: routers/page_aware_v2.py:286-293)"""
        import jax

        stats = self.registry.stats()
        return HealthResponse(
            status="ok",
            documents=stats["documents"],
            chunks=stats["chunks"],
            backend=jax.default_backend(),
            version=__version__,
        ).model_dump()
