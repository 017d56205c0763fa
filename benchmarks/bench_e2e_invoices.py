"""Config #1: the invoices end-to-end slice — ingest the reference's
sample PDFs, hybrid query, verify routing (BASELINE.md; CPU-runnable)."""

import os
import shutil
import tempfile
import time
from pathlib import Path

from common import emit

INVOICES = Path("/root/reference/invoices")


def main() -> None:
    tmp = tempfile.mkdtemp()
    os.environ["STORAGE_DIR"] = os.path.join(tmp, "storages")
    os.environ["LLM_PROVIDER"] = "fake"
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config().ensure_dirs()
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    from intool_rag_tpu.index.registry import CorpusRegistry
    from intool_rag_tpu.ingest.pipeline import IngestionPipeline
    from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
    from intool_rag_tpu.query.retriever import PageLevelRetriever

    if not INVOICES.exists():
        emit("e2e_invoices", 0, "skipped", reason="samples not mounted")
        return

    registry = CorpusRegistry()
    provider = HashEmbeddingProvider(256)
    pipeline = IngestionPipeline(storage=registry.storage, embedding_provider=provider)
    t0 = time.perf_counter()
    chunks = 0
    for i, pdf in enumerate(sorted(INVOICES.glob("*.pdf"))):
        result = pipeline.ingest_file(pdf, project="invoices", doc_id=f"inv{i}")
        chunks += result["chunk_count"]
    registry.load_all()
    ingest_s = time.perf_counter() - t0

    retriever = PageLevelRetriever(registry, provider=provider)
    t0 = time.perf_counter()
    pages = retriever.retrieve_and_rank_pages("What is the balance due for Aaron Hawkins?")
    query_ms = (time.perf_counter() - t0) * 1000
    ok = bool(pages) and "Aaron" in (pages[0].source_file or "") + registry.store.texts[0]
    emit(
        "e2e_invoices_ingest_seconds", ingest_s, "s",
        chunks=chunks, query_ms=round(query_ms, 1),
        routed_correctly=bool(pages and "4820" in pages[0].context_text),
        backend=backend,
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
