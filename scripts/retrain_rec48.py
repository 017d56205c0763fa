"""Rec-only retrain at 48-px crop height (ROADMAP #3's next lever).

Round-3 invoice diagnosis left recognizer-level glyph drops ($, commas,
thin punctuation) at 32-px crop sampling. Crops are SAMPLED from the
source raster at bundle.rec_h (pipeline crop_quad/tighten_crop), so
48 px keeps 50% more glyph detail end-to-end — the conv recognizer
adapts its height-collapse at init (no arch change), cls stays at its
trained 32 px (its batch path downsizes independently), det unchanged.

Trains a FRESH conv recognizer at rec_h=48 / col_stride=1 with the same
business-English sampler and font upweighting as the shipped retrain,
saves weights/rec48.npz, then evaluates BOTH bundles on the reference
invoices and synth pages. Promote to default.npz only on a win.

Run on the TPU host:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/retrain_rec48.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.backend import ensure_backend  # noqa: E402

print("backend:", ensure_backend(), flush=True)

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import train_recognizer_cached  # noqa: E402

logger = get_logger(__name__)
BUNDLE = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
OUT = BUNDLE.parent / "rec48.npz"


def make_sampler(charset: str, max_len: int):
    from intool_rag_tpu.ocr.synth import business_text

    def sampler(rng: np.random.Generator):
        if rng.random() >= 0.40:
            return None
        return business_text(rng, charset, max_len)

    return sampler


def main() -> None:
    t0 = time.time()
    base = OCRModelBundle.load(BUNDLE)
    charset = base.charset
    max_len = 16
    steps = int(os.environ.get("RETRAIN_STEPS", 50_000))
    # round-3 font error sweep upweights: mono, serif, mono-bold
    font_probs = [0.22, 0.10, 0.14, 0.22, 0.12, 0.20]
    model, rec_p, _, losses = train_recognizer_cached(
        charset,
        pool_size=12288,
        steps=steps,
        batch=64,
        width=64,
        seed=int(os.environ.get("RETRAIN_SEED", 48)),
        crop_w=480,  # 16 chars at h=48 aspect; frames T = 240 (stride 1)
        max_len=max_len,
        lr=1.2e-3,
        col_stride=1,
        text_sampler=make_sampler(charset, max_len),
        font_probs=font_probs,
        rec_h=48,
    )
    tail = float(np.mean(losses[-500:]))
    logger.info("trained %d steps in %.1f min, tail loss %.4f",
                steps, (time.time() - t0) / 60, tail)

    import dataclasses

    bundle48 = dataclasses.replace(
        base, rec=model, rec_params=rec_p, rec_h=48
    )
    bundle48.save(OUT)
    print(f"saved {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)", flush=True)

    # ---- head-to-head eval ----
    from intool_rag_tpu.ocr.eval import evaluate_engine, evaluate_on_invoices
    from intool_rag_tpu.ocr.pipeline import OCREngine

    for name, b in (("base32", base), ("rec48", bundle48)):
        engine = OCREngine(bundle=b, det_limit=1280)
        inv = evaluate_on_invoices(engine, scale=2.0)
        syn = evaluate_engine(engine, pages=5)
        print(
            f"{name}: invoices exact {inv['exact_rate']:.3f} / fuzzy "
            f"{inv['fuzzy_rate']:.3f} (spurious {inv.get('spurious_rate', -1):.3f}); "
            f"synth exact {syn['exact_rate']:.3f} / fuzzy {syn['fuzzy_rate']:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
