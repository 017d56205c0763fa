"""Continue training the shipped OCR bundle: more det steps with a
heavier 90-degree mix (detection coverage on sideways scans) and a long
recognizer continuation at reduced LR (exact-match rate)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import (  # noqa: E402
    train_synthetic_detector,
    train_synthetic_recognizer,
)

logger = get_logger(__name__)

path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
bundle = OCRModelBundle.load(path)
charset = bundle.charset

_, det_p, det_losses = train_synthetic_detector(
    charset, steps=500, width=bundle.det.width, seed=101, lr=5e-4,
    rot90_frac=0.35, init_params=bundle.det_params,
)
logger.info("det finetune final %.4f", det_losses[-1])
bundle = OCRModelBundle(
    bundle.det, det_p, bundle.cls, bundle.cls_params,
    bundle.rec, bundle.rec_params, charset,
)
bundle.save(path)
logger.info("det saved (checkpoint)")

_, rec_p, _, rec_losses = train_synthetic_recognizer(
    charset, steps=12000, width=bundle.rec.width, seed=202, lr=8e-4,
    min_len=3, max_len=12, batch=32, init_params=bundle.rec_params,
)
logger.info("rec finetune final %.4f (min %.4f)", rec_losses[-1], min(rec_losses))
bundle = OCRModelBundle(
    bundle.det, det_p, bundle.cls, bundle.cls_params, bundle.rec, rec_p, charset
)
bundle.save(path)
print(f"saved {path} ({path.stat().st_size / 1e6:.2f} MB)")
