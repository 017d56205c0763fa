"""Retrain the orientation classifier with the cached-pool trainer and
splice it into the shipped bundle."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import train_classifier_cached  # noqa: E402

logger = get_logger(__name__)

path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
bundle = OCRModelBundle.load(path)
cls_m, cls_p, losses = train_classifier_cached(
    bundle.charset, width=bundle.cls.width, seed=5
)
logger.info("cls tail-500 loss %.4f", float(np.mean(losses[-500:])))
out = OCRModelBundle(
    bundle.det, bundle.det_params, cls_m, cls_p,
    bundle.rec, bundle.rec_params, bundle.charset,
)
out.save(path)
print(f"saved {path} (cls tail {float(np.mean(losses[-500:])):.4f})")
