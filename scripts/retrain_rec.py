"""Rec-only retrain at doubled CTC column resolution (col_stride=1).

Round-3 invoice diagnosis: the shipped recognizer drops narrow glyphs
on CLEAN crops ('Quantity'->'Quantty', 'Total:'->'Toal:') — at W/4
column stride a 6-9 px glyph gets 1-2 CTC frames and collapses into
its neighbor. This retrains ONLY the recognizer at W/2 frames
(models.CTCRecognizer col_stride=1) with a text mix weighted toward
real business/invoice English on top of the existing
wordlike/multiscript pool; det + cls weights are reused from the
shipped bundle (measured fine: rot-15 fuzzy 0.958). Crops stay at
320 px / 16 chars — per-glyph frame resolution is set by the STRIDE,
not the crop length, and the conv+attention stack has no positional
encoding, so longer serving crops (cap 1024 px) extrapolate freely;
meanwhile the CTC scan is serial in T, and T=160 trains ~3× faster
than T=256 (measured 3.5 vs 9 s/100-step launch).

Run on the TPU host: PYTHONPATH=. python scripts/retrain_rec.py
"""

import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.train import train_recognizer_cached  # noqa: E402

logger = get_logger(__name__)
t0 = time.time()

BUNDLE = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
CKPT = Path("/tmp/retrain_rec_r3.ckpt")

def make_sampler(charset: str, max_len: int):
    """40% business-English lexicon lines (synth.business_text — shared
    with the bigram-LM rescorer so the decode prior matches), 60% the
    trainer's default wordlike/multiscript mix."""
    from intool_rag_tpu.ocr.synth import business_text

    def sampler(rng: np.random.Generator):
        if rng.random() >= 0.40:
            return None
        return business_text(rng, charset, max_len)

    return sampler


def main() -> None:
    import os

    bundle = OCRModelBundle.load(BUNDLE)
    charset = bundle.charset
    max_len = 16
    # continuation: when the shipped bundle is already the col_stride=1
    # model, keep training it on a FRESH pool (new seed → new rendered
    # crops) — pool diversity, not step count, is the binding constraint
    # of the cached trainer
    cont = bundle.rec.col_stride == 1 and os.environ.get("RETRAIN_FRESH") != "1"
    seed = int(os.environ.get("RETRAIN_SEED", 44 if cont else 43))
    steps = int(os.environ.get("RETRAIN_STEPS", 60_000))
    logger.info(
        "charset %d classes; rec-only retrain (continue=%s seed=%d)",
        len(charset), cont, seed,
    )

    if CKPT.exists():
        with CKPT.open("rb") as f:
            rec_p, tail = pickle.load(f)
        logger.info("loaded checkpoint %s", CKPT)
    else:
        # per-font error sweep on clean crops (round 3): mono 13/21,
        # sans 9/21, mono-bold 8/21, serif 4/21, sans-bold 3/21,
        # serif-bold 1/21 → upweight the weak faces
        font_probs = [0.22, 0.10, 0.14, 0.22, 0.12, 0.20]
        model, rec_p, _, losses = train_recognizer_cached(
            charset,
            pool_size=12288,
            steps=steps,
            batch=64,
            width=64,
            seed=seed,
            crop_w=320,
            max_len=max_len,
            lr=6e-4 if cont else 1.2e-3,
            col_stride=1,
            text_sampler=make_sampler(charset, max_len),
            font_probs=font_probs,
            init_params=bundle.rec_params if cont else None,
        )
        tail = float(np.mean(losses[-500:]))
        with CKPT.open("wb") as f:
            pickle.dump((rec_p, tail), f)
        logger.info("rec done (%.0fs) tail-500 loss %.4f", time.time() - t0, tail)

    # reuse the loaded bundle's det/cls MODULES (their widths travel
    # with the artifact — a hardcoded width here would desync if the
    # shipped bundle is ever retrained at another size); only the
    # recognizer is rebuilt at the new architecture
    from intool_rag_tpu.ocr.models import CTCRecognizer

    rec = CTCRecognizer(vocab_size=len(charset), width=64, col_stride=1)
    out = OCRModelBundle(
        bundle.det, bundle.det_params, bundle.cls, bundle.cls_params,
        rec, rec_p, charset,
    )
    out.save(BUNDLE)
    print(f"saved {BUNDLE} (rec col_stride=1, tail loss {tail:.4f}, "
          f"{time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
