"""Normalizer behavior tests
(reference behavior: rag/ingest/page_normalizer.py)."""

from intool_rag_tpu.ingest.normalizer import PageNormalizer, TextNormalizer


def test_nfkc_and_whitespace():
    tn = TextNormalizer()
    out = tn.normalize("ﬁle  name here")  # ligature + nbsp
    assert out == "file name here"


def test_hyphen_and_soft_breaks():
    tn = TextNormalizer()
    out = tn.normalize("infor-\nmation about\nretrieval")
    assert out == "information about retrieval"


def test_paragraph_breaks_preserved():
    tn = TextNormalizer()
    out = tn.normalize("para one\n\n\n\npara two")
    assert out == "para one\n\npara two"


def test_watermark_and_page_numbers_removed():
    tn = TextNormalizer()
    out = tn.normalize("CONFIDENTIAL\nreal content here\nPage 3 of 10")
    assert "CONFIDENTIAL" not in out
    assert "Page 3" not in out
    assert "real content here" in out


def test_validity_gate():
    pn = PageNormalizer()
    assert not pn.normalize_page(0, "x").is_valid  # too short
    assert pn.normalize_page(0, "this page has plenty of valid text content").is_valid


def test_repeated_header_footer_removed():
    pn = PageNormalizer()
    pages = {
        i: f"ACME Corp Annual Report\nBody text for page {i} with content.\nFooter line"
        for i in range(6)
    }
    out = pn.normalize_pages(pages)
    for np_ in out:
        assert "ACME Corp" not in np_.text
        assert "Footer line" not in np_.text
        assert "Body text" in np_.text
