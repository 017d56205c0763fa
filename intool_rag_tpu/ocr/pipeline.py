"""OCR orchestrator: det → cls → rec over an image
(reference: rag/ingest/ocr/main.py:35-467, RapidOCR.__call__)."""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from ..logging import get_logger
from .models import OCRModelBundle
from .postprocess import (
    TextBox,
    crop_box,
    ctc_greedy_decode,
    db_boxes_from_prob_map,
    resize_norm_crop,
    to_markdown,
)

logger = get_logger(__name__)

DEFAULT_CHARSET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    " .,:;!?()[]{}$%&@#+-*/=<>'\"_"
)


@dataclasses.dataclass
class OCRLine:
    box: TextBox
    text: str
    confidence: float


@dataclasses.dataclass
class OCRResult:
    lines: list[OCRLine]
    elapse: dict[str, float]

    @property
    def text(self) -> str:
        return "\n".join(line.text for line in self.lines if line.text)

    def to_markdown(self) -> str:
        return to_markdown([(l.box, l.text, l.confidence) for l in self.lines])

    def mean_confidence(self) -> float:
        if not self.lines:
            return 0.0
        return float(np.mean([l.confidence for l in self.lines]))


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class OCREngine:
    """det→cls→rec pipeline with per-stage timing (the reference records
    per-stage elapse, utils/output.py:25-30)."""

    def __init__(
        self,
        bundle: OCRModelBundle | None = None,
        *,
        use_cls: bool = True,
        text_score: float = 0.5,
        det_limit: int = 640,
    ) -> None:
        self.bundle = bundle or OCRModelBundle.create(DEFAULT_CHARSET)
        self.use_cls = use_cls
        self.text_score = text_score
        self.det_limit = det_limit
        self._det_fn = jax.jit(self.bundle.det.apply)
        self._cls_fn = jax.jit(self.bundle.cls.apply)
        self._rec_fn = jax.jit(self.bundle.rec.apply)

    # ---------------- stages ----------------

    def detect(self, image: np.ndarray) -> list[TextBox]:
        h, w = image.shape[:2]
        scale = min(1.0, self.det_limit / max(h, w))
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        # pad to multiples of 32 for clean stride-16 feature maps
        ph, pw = _round_up(int(h * scale), 32), _round_up(int(w * scale), 32)
        canvas = np.zeros((ph, pw, 3), np.float32)
        if scale < 1.0:
            from .postprocess import resize_norm_crop  # reuse bilinear

            resized = resize_norm_crop(img, target_h=int(h * scale), max_w=pw)
            canvas[: resized.shape[0]] = resized[:, :pw]
        else:
            canvas[:h, :w] = img
        prob = np.asarray(self._det_fn(self.bundle.det_params, canvas[None]))[0]
        boxes = db_boxes_from_prob_map(prob, scale=2.0 / scale)
        return [
            TextBox(
                min(b.x0, w - 1), min(b.y0, h - 1),
                min(b.x1, w), min(b.y1, h), b.score,
            )
            for b in boxes
            if b.x1 > b.x0 and b.y1 > b.y0
        ]

    def _batch_crops(self, crops: list[np.ndarray], target_h: int = 32) -> np.ndarray:
        """Aspect-ratio-sorted batching (reference: ch_ppocr_rec/main.py:96-137)
        is handled by the caller ordering; here crops resize to a shared
        padded width bucket."""
        resized = [resize_norm_crop(c, target_h=target_h) for c in crops]
        max_w = max(r.shape[1] for r in resized)
        batch = np.zeros((_round_up(len(crops), 8), target_h, max_w, 3), np.float32)
        for i, r in enumerate(resized):
            batch[i, :, : r.shape[1]] = r
        return batch

    def classify_and_fix(self, crops: list[np.ndarray]) -> list[np.ndarray]:
        """Rotate crops classified as 180° (score > 0.9, reference
        ch_ppocr_cls/main.py:36-74)."""
        if not crops:
            return crops
        batch = self._batch_crops(crops)
        logits = np.asarray(self._cls_fn(self.bundle.cls_params, batch))[: len(crops)]
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        out = []
        for crop, p in zip(crops, probs):
            if p[1] > 0.9:
                out.append(np.rot90(crop, 2).copy())
            else:
                out.append(crop)
        return out

    def recognize(self, crops: list[np.ndarray]) -> list[tuple[str, float]]:
        if not crops:
            return []
        # aspect-sorted batching keeps padding waste bounded
        order = sorted(range(len(crops)), key=lambda i: crops[i].shape[1] / max(1, crops[i].shape[0]))
        results: list[tuple[str, float]] = [("", 0.0)] * len(crops)
        bs = 8
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            batch = self._batch_crops([crops[i] for i in idx])
            logits = np.asarray(self._rec_fn(self.bundle.rec_params, batch))
            decoded = ctc_greedy_decode(logits[: len(idx)], self.bundle.charset)
            for i, d in zip(idx, decoded):
                results[i] = d
        return results

    # ---------------- orchestration ----------------

    def __call__(self, image: np.ndarray) -> OCRResult:
        elapse: dict[str, float] = {}
        t0 = time.perf_counter()
        boxes = self.detect(image)
        elapse["det"] = time.perf_counter() - t0

        crops = [crop_box(image, b) for b in boxes]
        keep = [i for i, c in enumerate(crops) if c.size > 0]
        boxes = [boxes[i] for i in keep]
        crops = [crops[i] for i in keep]

        if self.use_cls and crops:
            t0 = time.perf_counter()
            crops = self.classify_and_fix(crops)
            elapse["cls"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        texts = self.recognize(crops)
        elapse["rec"] = time.perf_counter() - t0

        lines = [
            OCRLine(box, text, conf)
            for box, (text, conf) in zip(boxes, texts)
            if conf >= self.text_score and text
        ]
        return OCRResult(lines=lines, elapse=elapse)
