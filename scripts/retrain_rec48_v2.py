"""48-px recognizer retrain, round 2: fresh-pool rounds (anti-overfit).

The single-pool 50k-step run (scripts/retrain_rec48.py) reached train
loss 0.085 but LOST to the shipped 32-px model on every recognizer-only
eval (fonts 18-30: 0.675 vs 0.750 exact) — 12,288 crops × 50k steps ×
batch 64 shows each crop ~260 times, and the 1.5×-larger
height-collapse Dense at rec_h=48 memorizes the pool (the shipped
32-px model's own history already found that "pool diversity, not step
count, is the binding constraint" — scripts/retrain_rec.py:59-62).

This run splits the same step budget into ROUNDS over freshly rendered
pools (new seed → new pages/crops each round), warm-starting params
between rounds with a decaying LR. Evaluates head-to-head vs the
shipped bundle; promotion to default.npz is a separate decision.

Run on the TPU host:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/retrain_rec48_v2.py
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

ROUNDS = [(12_500, 1.2e-3), (12_500, 6e-4), (12_500, 4e-4), (12_500, 3e-4)]


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
    font_probs = [0.22, 0.10, 0.14, 0.22, 0.12, 0.20]
    rec_p = None
    model = None
    for r, (steps, lr) in enumerate(ROUNDS):
        model, rec_p, _, losses = train_recognizer_cached(
            charset,
            pool_size=12288,
            steps=steps,
            batch=64,
            width=64,
            seed=4800 + r,  # fresh pool every round
            crop_w=480,
            max_len=max_len,
            lr=lr,
            col_stride=1,
            text_sampler=make_sampler(charset, max_len),
            font_probs=font_probs,
            rec_h=48,
            init_params=rec_p,
        )
        tail = float(np.mean(losses[-100:]))
        logger.info(
            "round %d/%d done (%.1f min total): tail loss %.4f",
            r + 1, len(ROUNDS), (time.time() - t0) / 60, tail,
        )

    import dataclasses

    bundle48 = dataclasses.replace(base, rec=model, rec_params=rec_p, rec_h=48)
    bundle48.save(OUT)
    print(f"saved {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)", flush=True)

    from intool_rag_tpu.ocr.eval import evaluate_engine, evaluate_on_invoices
    from intool_rag_tpu.ocr.pipeline import OCREngine

    for name, b in (("base32", base), ("rec48v2", bundle48)):
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
