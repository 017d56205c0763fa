"""Train the SVTR zoo recognizer and compare crop-level accuracy with
the shipped conv recognizer on identical held-out synthetic crops.

Backs OCR zoo item #45 with trained weights for the second architecture
(the reference ships multiple rec architectures as ONNX files; here both
archs train from the same cached-pool trainer). Artifact:
``intool_rag_tpu/ocr/weights/svtr_rec.npz`` (rec params + meta json).

Usage:
    SVTR_STEPS=8000 python scripts/train_svtr_demo.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from intool_rag_tpu.ocr.pipeline import DEFAULT_WEIGHTS
    from intool_rag_tpu.ocr.models import OCRModelBundle
    from intool_rag_tpu.ocr.postprocess import ctc_greedy_decode
    from intool_rag_tpu.ocr.train import train_recognizer_cached

    bundle = OCRModelBundle.load(DEFAULT_WEIGHTS)
    charset = bundle.charset
    steps = int(os.environ.get("SVTR_STEPS", 8000))
    t0 = time.time()
    model, params, losses = train_recognizer_cached(
        charset,
        pool_size=int(os.environ.get("SVTR_POOL", 6144)),
        steps=steps,
        batch=32,
        width=int(os.environ.get("SVTR_WIDTH", 48)),
        col_stride=1,
        seed=3,
        arch="svtr",
    )
    t_train = time.time() - t0
    print(f"# trained {steps} steps in {t_train:.0f}s, "
          f"final loss {float(losses[-1]):.3f}", file=sys.stderr)

    # held-out eval: crops from a seed the trainer never uses
    from intool_rag_tpu.ocr.synth import render_line, canonicalize_text
    from intool_rag_tpu.ocr.synth import wordlike_text, business_text
    from intool_rag_tpu.ocr.postprocess import resize_norm_crop

    rng = np.random.default_rng(991)
    texts, crops = [], []
    for _ in range(200):
        text = (
            business_text(rng, charset, 22)
            if rng.random() < 0.5
            else wordlike_text(rng, charset, max_len=12)
        )
        ink = render_line(text, font_size=int(rng.integers(18, 28)))
        crop = 1.0 - ink
        crop3 = np.repeat(crop[:, :, None], 3, axis=2)
        crops.append(resize_norm_crop(crop3, target_h=32, max_w=640))
        texts.append(canonicalize_text(text))
    w_max = max(c.shape[1] for c in crops)
    w_max = -(-w_max // 64) * 64
    batch = np.ones((len(crops), 32, w_max, 3), np.float32)
    for i, c in enumerate(crops):
        batch[i, :, : c.shape[1]] = c

    def acc(m, p):
        out = []
        for s in range(0, len(batch), 32):
            logits = np.asarray(m.apply(p, batch[s : s + 32]))
            out += [t for t, _ in ctc_greedy_decode(logits, charset)]
        exact = np.mean([g == w for g, w in zip(out, texts)])
        import difflib

        fuzzy = np.mean([
            difflib.SequenceMatcher(None, g, w).ratio()
            for g, w in zip(out, texts)
        ])
        return float(exact), float(fuzzy)

    svtr_exact, svtr_fuzzy = acc(model, params)
    conv_exact, conv_fuzzy = acc(bundle.rec, bundle.rec_params)

    out = pathlib.Path(__file__).resolve().parents[1] / (
        "intool_rag_tpu/ocr/weights/svtr_rec.npz"
    )
    import flax.serialization as ser

    meta = json.dumps({
        "charset": charset, "arch": "svtr", "width": model.width,
        "col_stride": model.col_stride, "steps": steps,
    })
    np.savez_compressed(
        out,
        meta=np.frombuffer(meta.encode("utf-8"), np.uint8),
        rec=np.frombuffer(ser.to_bytes(params), np.uint8),
    )
    print(json.dumps({
        "svtr": {"exact": round(svtr_exact, 4), "fuzzy": round(svtr_fuzzy, 4)},
        "conv_shipped": {
            "exact": round(conv_exact, 4), "fuzzy": round(conv_fuzzy, 4),
        },
        "steps": steps,
        "train_s": round(t_train, 1),
        "artifact": str(out),
    }))


if __name__ == "__main__":
    main()
