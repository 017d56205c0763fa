"""Robustness: concurrent ingest+query hammering (race coverage —
SURVEY.md §5.2: the reference has no concurrency safety story), chunk
overlap, and xref-stream/ObjStm PDF parsing."""

import threading
import zlib

import httpx
import numpy as np
import pytest

from intool_rag_tpu.ingest.chunker import ChunkerConfig, NodeAwareChunker
from intool_rag_tpu.ingest.pdf import extract_pdf_text


# ---------------- chunk overlap ----------------


def test_chunk_overlap():
    cfg = ChunkerConfig(max_chars=120, min_chars=10, target_chars=80, overlap_chars=20)
    text = "\n\n".join(f"paragraph number {i} with several words here" for i in range(6))
    chunks = NodeAwareChunker(cfg).chunk_text(text)
    assert len(chunks) > 1
    for prev, cur in zip(chunks, chunks[1:]):
        head = cur[:25]
        # the head of each chunk repeats the tail of the previous one
        assert head.split()[0] in prev, (prev, cur)
    assert all(len(c) <= 120 for c in chunks)


def test_chunk_overlap_disabled_by_default():
    cfg = ChunkerConfig(max_chars=120, min_chars=10, target_chars=80)
    text = "\n\n".join(f"paragraph number {i} with several words here" for i in range(6))
    chunks = NodeAwareChunker(cfg).chunk_text(text)
    joined = " ".join(chunks)
    for i in range(6):
        assert joined.count(f"paragraph number {i} ") <= 1


# ---------------- xref-stream PDF ----------------


def _xref_stream_pdf(text: str) -> bytes:
    """PDF 1.5 with a cross-reference STREAM and the catalog+pages inside
    an object stream (the modern layout PyMuPDF-produced files use)."""
    content = b"BT /F1 12 Tf 72 720 Td (" + text.encode() + b") Tj ET"
    content_stream = zlib.compress(content)

    # object numbers: 1=font, 2=content, 3=page, 4=ObjStm(5=pages,6=catalog), 7=xref stream
    objstm_inner = (
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Catalog /Pages 5 0 R >>"
    )
    cat_off = objstm_inner.find(b"<< /Type /Catalog")
    header = b"5 0 6 %d " % cat_off
    objstm_data = zlib.compress(header + objstm_inner)

    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects[2] = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content_stream)
        + content_stream + b"\nendstream"
    )
    objects[3] = (
        b"<< /Type /Page /Parent 5 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>"
    )
    objects[4] = (
        b"<< /Type /ObjStm /N 2 /First %d /Length %d /Filter /FlateDecode >>\nstream\n"
        % (len(header), len(objstm_data))
        + objstm_data + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in (1, 2, 3, 4):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"

    # xref stream entries for objects 0..7, W = [1, 4, 2]
    import struct

    def entry(ftype, f2, f3):
        return struct.pack(">BIH", ftype, f2, f3)

    xref_offset = len(out)
    rows = [
        entry(0, 0, 0),                  # 0 free
        entry(1, offsets[1], 0),
        entry(1, offsets[2], 0),
        entry(1, offsets[3], 0),
        entry(1, offsets[4], 0),
        entry(2, 4, 0),                  # obj 5 in ObjStm 4, index 0
        entry(2, 4, 1),                  # obj 6 in ObjStm 4, index 1
        entry(1, xref_offset, 0),        # the xref stream itself
    ]
    xref_data = zlib.compress(b"".join(rows))
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Root 6 0 R "
        b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(xref_data)
        + xref_data + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF" % xref_offset
    return bytes(out)


def test_pdf_xref_stream_and_objstm():
    pdf = _xref_stream_pdf("Modern xref layout works")
    pages = extract_pdf_text(pdf)
    assert len(pages) == 1
    assert "Modern xref layout works" in pages[0]


# ---------------- concurrent service hammering ----------------


@pytest.mark.slow
def test_concurrent_ingest_and_query(tmp_storage, monkeypatch):
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    from intool_rag_tpu import config as config_mod
    from intool_rag_tpu.llm.semantic.factory import reset_semantic_analyzer

    config_mod.reset_config()
    reset_semantic_analyzer()
    from intool_rag_tpu.index.registry import CorpusRegistry
    from intool_rag_tpu.providers.fake import FakeLLM
    from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
    from intool_rag_tpu.service.app import RAGService
    from intool_rag_tpu.service.http import ServiceServer

    svc = RAGService(
        registry=CorpusRegistry(), llm=FakeLLM(), provider=HashEmbeddingProvider(64)
    )
    server = ServiceServer(service=svc, host="127.0.0.1", port=0)
    server.start_background()
    errors: list[str] = []
    try:
        base = f"http://127.0.0.1:{server.port}"

        def ingester(i):
            with httpx.Client(base_url=base, timeout=60) as c:
                for j in range(3):
                    r = c.post(
                        "/ingest",
                        params={"project": "p", "doc_id": f"doc{i}_{j}"},
                        files={"file": (f"d{i}{j}.txt",
                                        f"document {i} {j} about topic{i} details".encode())},
                    )
                    if r.status_code != 200:
                        errors.append(f"ingest {i}/{j}: {r.status_code} {r.text[:100]}")

        def querier(i):
            with httpx.Client(base_url=base, timeout=60) as c:
                for _ in range(5):
                    r = c.post("/query", json={"question": f"topic{i % 3} details?"})
                    if r.status_code != 200:
                        errors.append(f"query {i}: {r.status_code} {r.text[:100]}")

        threads = [threading.Thread(target=ingester, args=(i,)) for i in range(3)]
        threads += [threading.Thread(target=querier, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:3]
        # final state is consistent: all 9 documents present and queryable
        with httpx.Client(base_url=base, timeout=120.0) as c:
            assert c.get("/documents").json()["total"] == 9
            r = c.post("/query", json={"question": "topic1 details?"}).json()
            assert r["sources"]
    finally:
        server.shutdown()
        reset_semantic_analyzer()
