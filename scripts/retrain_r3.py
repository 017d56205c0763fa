"""Round-3 OCR retrain: all six DejaVu faces, scan degradations
(blur/JPEG/contrast), wide font sizes (14-48 px), invoice-statistics
text distribution (comma amounts, month dates, label colons), longer
crops (448 px / 20 chars). Rebuilds det + cls + rec and ships the
bundle at ocr/weights/default.npz.

Run on the TPU host: PYTHONPATH=. python scripts/retrain_r3.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.synth import build_charset  # noqa: E402
from intool_rag_tpu.ocr.train import (  # noqa: E402
    train_classifier_cached,
    train_recognizer_cached,
    train_synthetic_detector,
)

logger = get_logger(__name__)
t0 = time.time()

charset = build_charset()
logger.info("charset %d classes", len(charset))

det, det_p, det_losses = train_synthetic_detector(
    charset, steps=700, batch=4, seed=31,
)
logger.info("det done (%.0fs) loss %.4f", time.time() - t0, det_losses[-1])

cls_m, cls_p, cls_losses = train_classifier_cached(
    charset, pool_size=16384, steps=12_000, seed=32,
)
logger.info("cls done (%.0fs) loss %.4f", time.time() - t0,
            float(np.mean(cls_losses[-50:])))

rec, rec_p, _, rec_losses = train_recognizer_cached(
    charset, pool_size=16384, steps=60_000, width=64, seed=33,
    crop_w=448, max_len=20, lr=1.2e-3,
)
tail = float(np.mean(rec_losses[-500:]))
logger.info("rec done (%.0fs) tail-500 loss %.4f", time.time() - t0, tail)

out = OCRModelBundle(det, det_p, cls_m, cls_p, rec, rec_p, charset)
path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
out.save(path)
print(f"saved {path} ({len(charset)} classes, rec tail {tail:.4f}, "
      f"{time.time() - t0:.0f}s total)")
