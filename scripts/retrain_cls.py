"""Splice a retrained v-profile OrientationClassifier into the shipped
OCR bundle (det/rec weights in weights/default.npz predate the cls
architecture change and stay valid; only cls needs retraining)."""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import flax.serialization as ser  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import train_synthetic_classifier  # noqa: E402

path = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
with np.load(path) as z:
    meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
    bundle = OCRModelBundle.create(meta["charset"], width=meta["width"])
    det_p = ser.from_bytes(bundle.det_params, z["det"].tobytes())
    rec_p = ser.from_bytes(bundle.rec_params, z["rec"].tobytes())
print(f"det/rec restored; retraining cls (charset={len(meta['charset'])})")

cls_m, cls_p, losses = train_synthetic_classifier(
    meta["charset"], steps=1200, width=meta["width"], seed=0
)
print(f"cls final loss {losses[-1]:.4f} (min {min(losses):.4f})")

out = OCRModelBundle(
    bundle.det, det_p, cls_m, cls_p, bundle.rec, rec_p, meta["charset"]
)
out.save(path)
print(f"saved {path} ({path.stat().st_size / 1e6:.2f} MB)")
