"""Large-vocabulary recognizer training: the full renderable repertoire
(~2k classes after folding, build_charset_full) through the cached-pool
trainer — the in-environment demonstration that the recognizer stack
scales toward the reference's 18,385-char production vocabulary
(rag/ingest/ocr/networks/arch_config.yaml, SURVEY §2.7 #42/#45): class
count is bounded by renderable training data (fonts), not by the
architecture, the CTC head, or the trainer.

Fresh-pool rounds with warm start (the anti-overfit schedule that beat
single-pool training in scripts/retrain_rec48_v2.py), uniform random
strings over the full charset (plus a business-text slice so the
in-distribution eval stays honest). Recognizer-only eval by script
group; saves the bundle next to the shipped weights as
rec_fullvocab.npz (promotion to default stays a separate decision —
the default serves the invoice/business distribution).

Run on the TPU host:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_rec_fullvocab.py
"""

import dataclasses
import difflib
import sys
import time
import unicodedata
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from intool_rag_tpu.backend import ensure_backend  # noqa: E402

print("backend:", ensure_backend(), flush=True)

from intool_rag_tpu.logging import get_logger  # noqa: E402
from intool_rag_tpu.ocr.models import OCRModelBundle  # noqa: E402
from intool_rag_tpu.ocr.synth import build_charset_full  # noqa: E402
from intool_rag_tpu.ocr.train import train_recognizer_cached  # noqa: E402

logger = get_logger(__name__)
BUNDLE = Path(__file__).resolve().parents[1] / "intool_rag_tpu/ocr/weights/default.npz"
OUT = BUNDLE.parent / "rec_fullvocab.npz"

ROUNDS = [(12_500, 1.2e-3), (12_500, 6e-4), (12_500, 4e-4)]


def script_group(ch: str) -> str:
    try:
        name = unicodedata.name(ch)
    except ValueError:
        return "other"
    for s in ("LATIN", "GREEK", "CYRILLIC", "ARMENIAN", "GEORGIAN", "DIGIT"):
        if name.startswith(s) or f" {s} " in f" {name} ":
            return s.lower()
    return "symbol"


def make_sampler(charset: str, max_len: int):
    from intool_rag_tpu.ocr.synth import business_text

    def sampler(rng: np.random.Generator):
        # 25% business text (keeps the in-distribution skill), else the
        # trainer's uniform random_text covers the full class space
        if rng.random() >= 0.25:
            return None
        return business_text(rng, charset, max_len)

    return sampler


def eval_rec(model, params, charset: str, *, seed: int = 99) -> dict:
    """Recognizer-only eval: render held-out strings per script group
    across fonts/sizes, greedy-decode, report exact and fuzzy rates."""
    from intool_rag_tpu.ocr.postprocess import ctc_greedy_decode, resize_norm_crop
    from intool_rag_tpu.ocr.synth import DEFAULT_FONTS, render_line
    from intool_rag_tpu.ocr.train import _pad_batch

    rng = np.random.default_rng(seed)
    groups: dict[str, list[str]] = {}
    for ch in charset:
        groups.setdefault(script_group(ch), []).append(ch)
    out = {}
    for g, chars in sorted(groups.items()):
        if len(chars) < 10:
            continue
        texts, crops = [], []
        for _ in range(48):
            n = int(rng.integers(4, 9))
            t = "".join(rng.choice(chars, size=n))
            fs = int(rng.integers(18, 30))
            font = DEFAULT_FONTS[int(rng.integers(0, len(DEFAULT_FONTS)))]
            try:
                ink = render_line(t, font_path=font, font_size=fs)
            except Exception:
                continue
            crop = np.repeat((1.0 - ink)[:, :, None], 3, axis=2)
            w = max(8, int(round(crop.shape[1] * 32 / crop.shape[0])))
            crops.append(resize_norm_crop(crop, target_h=32, max_w=2048)[:, :w])
            texts.append(t)
        if not crops:
            continue
        images = _pad_batch(crops)
        logits = np.asarray(model.apply(params, images))
        decoded = ctc_greedy_decode(logits, charset)
        exact = sum(got == want for (got, _), want in zip(decoded, texts))
        fuzzy = float(np.mean([
            difflib.SequenceMatcher(None, got, want).ratio()
            for (got, _), want in zip(decoded, texts)
        ]))
        out[g] = {
            "n": len(texts),
            "classes": len(chars),
            "exact": round(exact / len(texts), 3),
            "fuzzy": round(fuzzy, 3),
        }
    return out


def main() -> None:
    t0 = time.time()
    charset = build_charset_full()
    print(f"charset: {len(charset)} classes", flush=True)
    max_len = 12
    rec_p = None
    model = None
    for r, (steps, lr) in enumerate(ROUNDS):
        model, rec_p, _, losses = train_recognizer_cached(
            charset,
            pool_size=12288,
            steps=steps,
            batch=64,
            width=64,
            seed=7200 + r,  # fresh pool every round
            crop_w=384,
            max_len=max_len,
            lr=lr,
            col_stride=2,
            text_sampler=make_sampler(charset, max_len),
            rec_h=32,
            init_params=rec_p,
        )
        tail = float(np.mean(losses[-100:]))
        logger.info(
            "round %d/%d done (%.1f min total): tail loss %.4f",
            r + 1, len(ROUNDS), (time.time() - t0) / 60, tail,
        )

    base = OCRModelBundle.load(BUNDLE)
    bundle = dataclasses.replace(
        base, rec=model, rec_params=rec_p, charset=charset, rec_h=32
    )
    bundle.save(OUT)
    print(f"saved {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)", flush=True)

    results = eval_rec(model, rec_p, charset)
    import json

    print(json.dumps({"fullvocab_eval": results, "classes": len(charset)},
                     ensure_ascii=False), flush=True)


if __name__ == "__main__":
    main()
