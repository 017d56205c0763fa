"""Retrain the shipped recognizer with the cached-pool scan trainer
(device-resident dataset, 100 steps/launch) and splice it into the
weights bundle."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import train_recognizer_cached  # noqa: E402

logger = get_logger(__name__)

path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
bundle = OCRModelBundle.load(path)

_, rec_p, _, losses = train_recognizer_cached(
    bundle.charset, pool_size=16384, steps=40_000,
    width=bundle.rec.width, seed=11, lr=1.5e-3,
)
tail = float(np.mean(losses[-500:]))
logger.info("rec cached final-500 mean loss %.4f", tail)
out = OCRModelBundle(
    bundle.det, bundle.det_params, bundle.cls, bundle.cls_params,
    bundle.rec, rec_p, bundle.charset,
)
out.save(path)
print(f"saved {path} (tail loss {tail:.4f})")
