"""PDF extractor tests: a hand-built minimal PDF plus the reference's real
invoice samples when mounted."""

import zlib
from pathlib import Path

import pytest

from intool_rag_tpu.exceptions import PDFParseError
from intool_rag_tpu.ingest.pdf import PDFDocument, extract_pdf_text

INVOICES = Path("/root/reference/invoices")


def build_minimal_pdf(page_texts: list[str], compress: bool = True) -> bytes:
    """Construct a small valid PDF with Helvetica text, classic xref."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    pages_id_placeholder = len(page_texts) * 2 + 2  # computed below properly

    for text in page_texts:
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        for i, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if i:
                ops.append(b"T*")
            ops.append(b"(" + esc.encode("latin-1", "replace") + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            data = zlib.compress(stream)
            content_ids.append(
                add(
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
                    + data
                    + b"\nendstream"
                )
            )
        else:
            content_ids.append(
                add(b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream")
            )

    pages_id = len(objects) + len(page_texts) + 1
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (pages_id, font, cid)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    )
    assert real_pages_id == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objects) + 1, catalog, xref_pos)
    )
    return bytes(out)


def test_minimal_pdf_roundtrip():
    pdf = build_minimal_pdf(["Hello World\nSecond line", "Page two content"])
    pages = extract_pdf_text(pdf)
    assert len(pages) == 2
    assert "Hello World" in pages[0]
    assert "Second line" in pages[0]
    assert pages[0].index("Hello World") < pages[0].index("Second line")
    assert "Page two content" in pages[1]


def test_minimal_pdf_uncompressed():
    pdf = build_minimal_pdf(["Plain stream text"], compress=False)
    assert "Plain stream text" in extract_pdf_text(pdf)[0]


def test_escaped_strings():
    pdf = build_minimal_pdf(["Parens (nested) and \\ backslash"])
    assert "Parens (nested) and \\ backslash" in extract_pdf_text(pdf)[0]


def test_not_a_pdf():
    with pytest.raises(PDFParseError):
        PDFDocument(b"this is not a pdf file")


def test_corrupted_pdfs_fail_cleanly():
    """Truncations and bit-flips must raise PDFParseError (or parse), never
    hang or raise unexpected exception types (the loader catches
    DocumentLoadError, so anything else would 500 the service)."""
    import random

    base = build_minimal_pdf(["fuzz target content"])
    rnd = random.Random(0)
    cases = [base[: len(base) // 2], base[:20], b"%PDF-1.4\n" + b"\x00" * 100]
    for _ in range(20):
        corrupted = bytearray(base)
        for _ in range(10):
            corrupted[rnd.randrange(len(corrupted))] = rnd.randrange(256)
        cases.append(bytes(corrupted))
    for data in cases:
        try:
            extract_pdf_text(data)
        except PDFParseError:
            pass
        except Exception as exc:  # noqa: BLE001
            # zlib/value errors from corrupted streams are acceptable only
            # if they subclass what the loader handles — they don't, so
            # surface them as failures to tighten the extractor
            pytest.fail(f"unexpected {type(exc).__name__}: {exc}")


def test_flate_bomb_rejected(monkeypatch):
    """A small deflate bomb must raise PDFParseError instead of
    expanding to gigabytes and OOMing the service (ADVICE.md round 1)."""
    import zlib

    from intool_rag_tpu.ingest import pdf as pdf_mod

    monkeypatch.setattr(pdf_mod, "MAX_STREAM_DECODED_BYTES", 1 << 20)
    bomb = zlib.compress(b"\x00" * (16 << 20))  # 16 MiB of zeros, ~16 KiB packed
    assert len(bomb) < 64 * 1024
    stream = pdf_mod.Stream(dict={"Filter": "FlateDecode"}, raw=bomb)
    with pytest.raises(PDFParseError, match="bomb|exceeds"):
        pdf_mod.decode_stream(stream)
    # a legitimate stream under the cap still decodes
    ok = pdf_mod.Stream(
        dict={"Filter": "FlateDecode"}, raw=zlib.compress(b"hello pdf")
    )
    assert pdf_mod.decode_stream(ok) == b"hello pdf"


@pytest.mark.skipif(not INVOICES.exists(), reason="reference samples not mounted")
@pytest.mark.parametrize("name", ["invoice_Aaron Hawkins_4820.pdf", "invoice_Adam Hart_36279.pdf"])
def test_real_invoice_extraction(name):
    data = (INVOICES / name).read_bytes()
    pages = extract_pdf_text(data)
    assert len(pages) == 1
    text = pages[0]
    # key fields must extract as words (ToUnicode + word-gap reconstruction)
    assert "INVOICE" in text
    assert "Balance Due" in text
    assert "Subtotal" in text
    # amounts survive with punctuation
    assert "$" in text


@pytest.mark.skipif(not INVOICES.exists(), reason="reference samples not mounted")
def test_real_invoice_specific_values():
    data = (INVOICES / "invoice_Aaron Hawkins_4820.pdf").read_bytes()
    text = extract_pdf_text(data)[0]
    assert "4820" in text
    assert "Aaron Hawkins" in text
    assert "2,724.57" in text
