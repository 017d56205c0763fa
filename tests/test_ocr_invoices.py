"""Out-of-distribution OCR e2e (round-2 verdict item 5): rasterize the
reference invoice PDFs with the in-repo renderer and recover the text
layer. Content, layout, line density and font sizes come from real
documents the synth generator never produces."""

from pathlib import Path

import numpy as np
import pytest

from intool_rag_tpu.ocr.eval import evaluate_on_invoices
from intool_rag_tpu.ocr.pipeline import DEFAULT_WEIGHTS, OCREngine

INVOICES = Path("/root/reference/invoices")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not DEFAULT_WEIGHTS.exists(), reason="no shipped OCR weights"
    ),
    pytest.mark.skipif(
        not INVOICES.exists(), reason="reference invoices not mounted"
    ),
]


def test_invoice_text_layer_recovery():
    engine = OCREngine(det_limit=1280)
    result = evaluate_on_invoices(engine, scale=2.0)
    assert result["lines"] >= 40  # both invoices contribute
    # measured round-5 level: exact 0.780 / fuzzy ~0.94 (scale-2
    # rasters ≈ 150 dpi scans). History: 0.293 → 0.488 (lexicon repair
    # + l→I) → 0.659 (round-4 confusion-pair/double-deletion/
    # segmentation classes) → 0.780 (round-5 nested-box suppression,
    # label-anchored deletion repair 'Tes:'→'Terms:', colon glyph
    # restoration 'Notes!.'→'Notes:'). Bars sit under the measured
    # level by a variance margin; 0.75 was the round-4 verdict target.
    assert result["exact_rate"] >= 0.75, result
    assert result["fuzzy_rate"] >= 0.88, result


def test_repair_generalization_second_family():
    """Round-4 verdict item 7: the post-OCR repair classes must
    GENERALIZE — on a second document family (delivery manifests:
    courier/city/product vocabulary and layout disjoint from invoices,
    synth.manifest_lines) the repair stack lifts exact recovery and the
    unique-candidate/common-word gates allow ZERO false rewrites
    (measured round 5, 4 pages: beam-only 0.712 → +repairs 0.750,
    false_rewrites 0; greedy baseline 0.731 — the LM beam alone dips on
    this family's unseen vocabulary, the repairs more than recover it)."""
    from intool_rag_tpu.ocr.eval import evaluate_repair_generalization

    result = evaluate_repair_generalization(pages=2, seed=77)
    assert result["lines"] >= 20
    assert result["false_rewrites"] == 0, result
    assert result["exact_on"] >= result["exact_beam_only"], result
    assert result["exact_on"] >= 0.6, result
