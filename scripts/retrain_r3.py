"""Round-3 OCR retrain: all six DejaVu faces, scan degradations
(blur/JPEG/contrast), wide font sizes (14-48 px), invoice-statistics
text distribution (comma amounts, month dates, label colons), longer
crops (448 px / 20 chars). Rebuilds det + cls + rec and ships the
bundle at ocr/weights/default.npz.

Each phase checkpoints its params to /tmp/retrain_r3_{phase}.ckpt as
soon as it finishes; a rerun after a crash/timeout skips completed
phases (delete the files to force a full retrain).

Run on the TPU host: PYTHONPATH=. python scripts/retrain_r3.py
"""

import pickle
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

CKPT = Path("/tmp")


def _ckpt(phase: str) -> Path:
    return CKPT / f"retrain_r3_{phase}.ckpt"


def _run_phase(phase: str, fn):
    p = _ckpt(phase)
    if p.exists():
        with p.open("rb") as f:
            out = pickle.load(f)
        logger.info("%s: loaded checkpoint %s", phase, p)
        return out
    out = fn()
    with p.open("wb") as f:
        pickle.dump(out, f)
    logger.info("%s done (%.0fs), checkpointed", phase, time.time() - t0)
    return out


charset = build_charset()
logger.info("charset %d classes", len(charset))

det_p = _run_phase(
    "det",
    lambda: train_synthetic_detector(charset, steps=700, batch=4, seed=31)[1],
)

cls_p = _run_phase(
    "cls",
    lambda: train_classifier_cached(
        charset, pool_size=16384, steps=12_000, seed=32
    )[1],
)

rec_out = _run_phase(
    "rec",
    lambda: (lambda m, p, _, losses: (p, float(np.mean(losses[-500:]))))(
        *train_recognizer_cached(
            charset, pool_size=16384, steps=60_000, width=64, seed=33,
            crop_w=448, max_len=20, lr=1.2e-3,
        )
    ),
)
rec_p, tail = rec_out

out = OCRModelBundle.create(charset, width=16, rec_width=64)
out = OCRModelBundle(
    out.det, det_p, out.cls, cls_p, out.rec, rec_p, charset
)
path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
out.save(path)
print(f"saved {path} ({len(charset)} classes, rec tail {tail:.4f}, "
      f"{time.time() - t0:.0f}s total)")
