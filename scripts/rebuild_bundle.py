"""Rebuild the OCR bundle on the current (near-homoglyph-folded)
charset: keep det/cls weights (charset-independent), retrain the
recognizer with the cached-pool scan trainer."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.synth import build_charset  # noqa: E402
from intool_rag_tpu.ocr.train import train_recognizer_cached  # noqa: E402

logger = get_logger(__name__)

path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
old = OCRModelBundle.load(path)
charset = build_charset()
logger.info("charset %d -> %d classes", len(old.charset), len(charset))

rec_model, rec_p, _, losses = train_recognizer_cached(
    charset, pool_size=32768, steps=60_000, width=64, seed=13,
    lr=1.2e-3,
)
tail = float(np.mean(losses[-500:]))
logger.info("rec tail-500 loss %.4f", tail)

fresh = OCRModelBundle.create(charset, width=old.det.width)
out = OCRModelBundle(
    old.det, old.det_params, old.cls, old.cls_params, rec_model, rec_p, charset
)
out.save(path)
print(f"saved {path} ({len(charset)} classes, rec tail {tail:.4f})")
