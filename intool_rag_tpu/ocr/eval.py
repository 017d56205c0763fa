"""OCR end-to-end evaluation on synthetic pages: render pages the
pipeline has never seen, run the full det→cls→rec engine, and score
string recovery (exact and fuzzy) — the verification the reference
delegates to its pretrained-model self-check (ingest/ocr/cli.py:19-25).
"""

from __future__ import annotations

import difflib

import numpy as np


def _best_ratio(text: str, candidates: list[str]) -> float:
    if not candidates:
        return 0.0
    return max(
        difflib.SequenceMatcher(None, text, c).ratio() for c in candidates
    )


def evaluate_engine(
    engine,
    *,
    pages: int = 5,
    rotation: float = 0.0,
    seed: int = 123,
    size: int = 448,
    font_sizes: tuple[int, int] = (18, 30),
) -> dict:
    """Render ``pages`` synthetic pages at ``rotation`` degrees, OCR each,
    and report line recovery rates. Returns dict with exact/fuzzy rates."""
    from .synth import render_page

    rng = np.random.default_rng(seed)
    total = 0
    exact = 0
    fuzzy_sum = 0.0
    detected = 0
    for _ in range(pages):
        img, gt = render_page(
            engine_rng(rng), engine.bundle.charset, size=size,
            rotation=rotation, font_sizes=font_sizes,
        )
        result = engine(img)
        got_texts = [ln.text for ln in result.lines]
        detected += len(got_texts)
        for _, want in gt:
            total += 1
            if want in got_texts:
                exact += 1
            fuzzy_sum += _best_ratio(want, got_texts)
    return {
        "lines": total,
        "detected": detected,
        "exact_rate": exact / max(total, 1),
        "fuzzy_rate": fuzzy_sum / max(total, 1),
    }


def engine_rng(rng: np.random.Generator) -> np.random.Generator:
    return np.random.default_rng(rng.integers(0, 2**31))


if __name__ == "__main__":
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    from .pipeline import OCREngine

    engine = OCREngine()
    out = {}
    for rot in (0.0, 15.0, -15.0, 90.0):
        out[f"rot{rot:+.0f}"] = evaluate_engine(engine, rotation=rot)
    print(json.dumps(out, indent=1))
