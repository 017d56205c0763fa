"""OCR orchestrator: det → cls → rec over an image
(reference: rag/ingest/ocr/main.py:35-467, RapidOCR.__call__)."""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from pathlib import Path

from ..logging import get_logger
from .models import OCRModelBundle
from .postprocess import (
    QuadBox,
    TextBox,
    crop_quad,
    ctc_greedy_decode,
    db_quads_from_prob_map,
    resize_norm_crop,
    tighten_crop,
    to_markdown,
)

logger = get_logger(__name__)

# Full vocabulary the shipped fonts can render (digits, latin,
# punctuation, extended latin, Cyrillic, Greek — synth.build_charset).
# The reference ships an 18,385-char multilingual ONNX vocab; offline we
# are bounded by renderable glyphs (no CJK font in the image — pass a
# CJK font + extra chars to train.train_full_ocr to extend).
from .synth import build_charset as _build_charset

DEFAULT_CHARSET = _build_charset()

DEFAULT_WEIGHTS = Path(__file__).parent / "weights" / "default.npz"


@dataclasses.dataclass
class OCRLine:
    box: TextBox  # axis-aligned bound (JSON/markdown layout)
    text: str
    confidence: float
    quad: QuadBox | None = None  # oriented region (rotated text)


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


def _suppress_nested(
    quads: list[QuadBox], *, containment: float = 0.8
) -> list[QuadBox]:
    """Drop quads nested inside a larger quad (round-5 invoice miss
    catalog: a duplicate inner detection — 'IY' fully inside the 'Item'
    header box — injects a phantom token into its visual row and breaks
    every row-join span through it). A quad is suppressed when ≥
    ``containment`` of its axis-aligned bbox area lies inside another
    quad's bbox of strictly larger area. The DB postprocess itself
    cannot produce nested components on one bitmap threshold, so nesting
    only arises from probability-map ambiguity — always a duplicate,
    never two real text lines (two lines stacked inside one box overlap
    that box, they are not contained by each other)."""
    if len(quads) < 2:
        return quads
    boxes = np.array(
        [[*q.points.min(axis=0), *q.points.max(axis=0)] for q in quads],
        np.float32,
    )  # [N, 4] x0 y0 x1 y1
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = np.ones(len(quads), bool)
    for i in range(len(quads)):
        ix0 = np.maximum(boxes[i, 0], boxes[:, 0])
        iy0 = np.maximum(boxes[i, 1], boxes[:, 1])
        ix1 = np.minimum(boxes[i, 2], boxes[:, 2])
        iy1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
        frac = inter / max(float(areas[i]), 1e-6)
        frac[i] = 0.0
        # container test: strictly larger area, OR equal area with a
        # lower index (round-5 review: two EXACT-duplicate detections
        # suppressed neither under strict '>', so the phantom-token
        # row-break persisted for coincident bboxes — keep exactly one)
        larger = (areas > areas[i]) | (
            (areas == areas[i]) & (np.arange(len(quads)) < i)
        )
        if np.any((frac >= containment) & larger & keep):
            keep[i] = False
    return [q for q, k in zip(quads, keep) if k]


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
        lm_rescore: bool = True,
        lexicon_repair: bool = True,
        auto_orient: bool = True,
    ) -> None:
        self.bundle = bundle or self._default_bundle()
        self.use_cls = use_cls
        self.text_score = text_score
        self.det_limit = det_limit
        # page-orientation pre-pass: when detection finds mostly
        # near-vertical reading axes (a 90°-rotated scan), rerun the
        # pipeline on the upright-rotated page and map boxes back — the
        # det/rec stack is strongest on horizontal text (the reference
        # gets this from its doc-orientation classifier stage)
        self.auto_orient = auto_orient
        # bigram-LM CTC beam rescoring (ocr/rescore.py): fixes
        # near-homoglyph flips greedy decode cannot (I/l, O/0)
        self.lm_rescore = lm_rescore
        # word-level lexicon repair, separable from the LM beam so the
        # repair classes can be evaluated in isolation (the
        # generalization eval's false-rewrite attribution)
        self.lexicon_repair = lexicon_repair
        self._det_fn = jax.jit(self.bundle.det.apply)
        self._cls_fn = jax.jit(self.bundle.cls.apply)
        self._rec_fn = jax.jit(self.bundle.rec.apply)

    @staticmethod
    def _default_bundle() -> OCRModelBundle:
        """The shipped trained weights when present (the working
        equivalent of the reference's pretrained model resolution,
        inference_engine/base.py:82-144), else random init (tests that
        train their own models pass a bundle explicitly)."""
        if DEFAULT_WEIGHTS.exists():
            try:
                return OCRModelBundle.load(DEFAULT_WEIGHTS)
            except Exception as exc:
                logger.warning("failed to load OCR weights: %s", exc)
        logger.warning(
            "no trained OCR weights at %s — using random init "
            "(run `python -m intool_rag_tpu.ocr.train` to build them)",
            DEFAULT_WEIGHTS,
        )
        return OCRModelBundle.create(DEFAULT_CHARSET)

    # ---------------- stages ----------------

    def detect(self, image: np.ndarray) -> list[QuadBox]:
        """Oriented text regions, reading order (reference: TextDetector
        + DBPostProcess minAreaRect quads, ch_ppocr_det/utils.py:117-202)."""
        h, w = image.shape[:2]
        scale = min(1.0, self.det_limit / max(h, w))
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        # pad to multiples of 32 for clean stride-16 feature maps;
        # pad with white (1.0) — pages are white, black borders would
        # read as giant text blobs to the detector
        ph, pw = _round_up(int(h * scale), 32), _round_up(int(w * scale), 32)
        canvas = np.ones((ph, pw, 3), np.float32)
        if scale < 1.0:
            from .postprocess import resize_norm_crop  # reuse bilinear

            resized = resize_norm_crop(img, target_h=int(h * scale), max_w=pw)
            canvas[: resized.shape[0]] = resized[:, :pw]
        else:
            canvas[:h, :w] = img
        prob = np.asarray(self._det_fn(self.bundle.det_params, canvas[None]))[0]
        quads = db_quads_from_prob_map(prob, scale=2.0 / scale)
        # keep quads whose center is inside the image (crop_quad clips
        # sample coordinates, so out-of-range corners are safe)
        out = []
        for q in quads:
            cx, cy = q.points.mean(axis=0)
            if 0 <= cx < w and 0 <= cy < h and q.width >= 2 and q.height >= 2:
                out.append(q)
        return out

    def _batch_crops(self, crops: list[np.ndarray], target_h: int = 32) -> np.ndarray:
        """Aspect-ratio-sorted batching (reference: ch_ppocr_rec/main.py:96-137)
        is handled by the caller ordering; here crops resize to their
        content width and pad to a shared 32-multiple bucket (the same
        zero padding the trainer's _pad_batch applies)."""
        # width cap 1024 (was 640): long invoice/table rows reach ~50
        # chars ≈ 800 px at h=32 — squashing past the trained aspect
        # drops characters, while the conv+CTC stack extrapolates in
        # WIDTH for free (translation invariance along the time axis)
        resized = []
        for c in crops:
            h, w = c.shape[:2]
            w_cap = 32 * target_h  # ~800 px of glyphs at h=32 scales with h
            cw = max(8, min(w_cap, int(round(w * target_h / max(1, h)))))
            resized.append(
                resize_norm_crop(c, target_h=target_h, max_w=w_cap)[:, :cw]
            )
        max_w = _round_up(max(r.shape[1] for r in resized), 32)
        batch = np.zeros((_round_up(len(crops), 8), target_h, max_w, 3), np.float32)
        for i, r in enumerate(resized):
            batch[i, :, : r.shape[1]] = r
        return batch

    def classify_and_fix(self, crops: list[np.ndarray]) -> list[np.ndarray]:
        """Rotate crops classified as 180° (score > 0.9, reference
        ch_ppocr_cls/main.py:36-74), with recognizer verification: a
        flip is kept only if the flipped orientation's emitted-frame
        confidence is at least the upright one's. A marginal
        false-positive flip (measured: 'Terms:' at p180=0.918) turns a
        readable crop into charset garbage that poisons downstream
        BM25/indexing; the recognizer is a far sharper orientation
        oracle than the 2-class head, and the check costs one extra
        rec batch over only the flagged crops (typically 0–2/page)."""
        if not crops:
            return crops
        batch = self._batch_crops(crops)
        logits = np.asarray(self._cls_fn(self.bundle.cls_params, batch))[: len(crops)]
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        flagged = [i for i, p in enumerate(probs) if p[1] > 0.9]
        keep_flip = set()
        if flagged:
            pairs: list[np.ndarray] = []
            for i in flagged:
                pairs.append(crops[i])
                pairs.append(np.rot90(crops[i], 2).copy())
            rec = np.asarray(
                self._rec_fn(
                    self.bundle.rec_params,
                    self._batch_crops(pairs, target_h=self.bundle.rec_h),
                )
            )[: len(pairs)]
            for j, i in enumerate(flagged):
                if self._emit_conf(rec[2 * j + 1]) >= self._emit_conf(
                    rec[2 * j]
                ):
                    keep_flip.add(i)
        return [
            np.rot90(c, 2).copy() if i in keep_flip else c
            for i, c in enumerate(crops)
        ]

    @staticmethod
    def _emit_conf(logits: np.ndarray) -> float:
        """Mean log-prob over emitted (non-blank argmax) frames — the
        orientation score for flip verification. Blank frames carry no
        orientation signal; an upside-down crop's emitted frames are
        low-probability homoglyph guesses."""
        x = logits - logits.max(axis=-1, keepdims=True)
        logp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
        ids = logp.argmax(axis=-1)
        blank = logits.shape[-1] - 1
        emitted = ids != blank
        if not emitted.any():
            return float("-inf")
        return float(logp[emitted, ids[emitted]].mean())

    def _decode_batch(self, batch: np.ndarray, n: int) -> list[tuple[str, float]]:
        logits = np.asarray(self._rec_fn(self.bundle.rec_params, batch))
        if self.lm_rescore:
            from .rescore import ctc_beam_decode, lexicon_correct

            decoded = ctc_beam_decode(logits[:n], self.bundle.charset)
            # word-level lexicon repair: beam+LM cannot recover a char
            # no beam contains; unique dist-1 repairs / two-word splits
            # against the serving lexicon can (rescore.lexicon_correct)
            if not self.lexicon_repair:
                return decoded
            return [(lexicon_correct(t), c) for t, c in decoded]
        return ctc_greedy_decode(logits[:n], self.bundle.charset)

    def recognize(self, crops: list[np.ndarray]) -> list[tuple[str, float]]:
        if not crops:
            return []
        # aspect-sorted batching keeps padding waste bounded
        order = sorted(range(len(crops)), key=lambda i: crops[i].shape[1] / max(1, crops[i].shape[0]))
        results: list[tuple[str, float]] = [("", 0.0)] * len(crops)
        bs = 8
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            decoded = self._decode_batch(
                self._batch_crops(
                    [crops[i] for i in idx], target_h=self.bundle.rec_h
                ),
                len(idx),
            )
            for i, d in zip(idx, decoded):
                results[i] = d
        return results

    # ---------------- orchestration ----------------

    def __call__(self, image: np.ndarray, _depth: int = 0) -> OCRResult:
        elapse: dict[str, float] = {}
        t0 = time.perf_counter()
        quads = self.detect(image)
        elapse["det"] = time.perf_counter() - t0

        if self.auto_orient and _depth == 0 and len(quads) >= 3:
            ang = np.array([q.angle % 180.0 for q in quads])
            vertical = (ang >= 60.0) & (ang <= 120.0)
            if vertical.mean() > 0.6:
                # rotate clockwise to upright (180° ambiguity is fixed
                # by the orientation classifier on the crops)
                h_orig = image.shape[0]
                res = self.__call__(np.rot90(image, -1).copy(), _depth=1)
                lines = []
                for ln in res.lines:
                    if ln.quad is None:
                        lines.append(ln)
                        continue
                    pts = ln.quad.points
                    back = np.stack(
                        [pts[:, 1], h_orig - 1.0 - pts[:, 0]], axis=1
                    ).astype(np.float32)
                    nq = QuadBox(back, ln.quad.score)
                    lines.append(
                        OCRLine(nq.aabb(), ln.text, ln.confidence, quad=nq)
                    )
                res.elapse["det"] += elapse["det"]
                return OCRResult(lines=lines, elapse=res.elapse)

        # DB maps merge vertically adjacent lines in dense layouts; cut
        # merged quads back into per-line sub-quads before cropping
        # (postprocess.split_quad_lines — projection profile at native
        # vertical resolution). Quads still tall after the axis-aligned
        # split retry with the page's dominant text angle
        # (split_quad_fragments) — rotated pages put merged fragments
        # in overlapping axis-aligned rows.
        from .postprocess import split_quad_fragments, split_quad_lines

        med_h = float(np.median([q.height for q in quads])) if quads else 0.0
        angs = [
            ((q.angle + 90.0) % 180.0) - 90.0
            for q in quads
            if q.width >= q.height
        ]
        med_a = float(np.median(angs)) if angs else 0.0
        out_quads = []
        for q in quads:
            parts = split_quad_lines(image, q)
            if len(parts) == 1 and abs(med_a) > 3.0 and med_h > 0:
                dev = abs(((q.angle - med_a) + 90.0) % 180.0 - 90.0)
                if q.height > 1.6 * med_h or dev > 4.0:
                    parts = split_quad_fragments(image, q, med_a, med_h)
            out_quads.extend(parts)
        quads = out_quads

        # rotated crop: each quad is resampled to an upright strip
        # (reference: get_rotate_crop_image, ocr/main.py:229-237), cut
        # at wide interior column gaps (horizontally merged fragments —
        # postprocess.split_strip_columns), then tightened to the ink
        # bounding box so cls/rec see the training crop distribution
        # (the quad carries DB unclip margin)
        from .postprocess import split_strip_columns

        split_pairs: list = []
        for q in quads:
            rec_h = self.bundle.rec_h
            strip = crop_quad(image, q, target_h=rec_h, max_w=32 * rec_h)
            if strip.size == 0:
                continue
            for part, sq in split_strip_columns(strip, q):
                tight = tighten_crop(part, target_h=rec_h)
                if tight.size > 0:
                    split_pairs.append((sq, tight))
        # nested-duplicate suppression runs on the FINAL per-line quads
        # (after vertical/column splits): in raw detect space the header
        # row is one wide quad and its split products don't exist yet,
        # so suppressing there removes the wrong box (measured: 'Item'
        # lost to a phantom 'IY' that only materializes post-split)
        kept = _suppress_nested([p[0] for p in split_pairs])
        kept_ids = {id(q) for q in kept}
        split_pairs = [p for p in split_pairs if id(p[0]) in kept_ids]
        quads = [p[0] for p in split_pairs]
        crops = [p[1] for p in split_pairs]

        if self.use_cls and crops:
            t0 = time.perf_counter()
            crops = self.classify_and_fix(crops)
            elapse["cls"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        texts = self.recognize(crops)
        elapse["rec"] = time.perf_counter() - t0

        lines = [
            OCRLine(q.aabb(), text, conf, quad=q)
            for q, (text, conf) in zip(quads, texts)
            if conf >= self.text_score and text
        ]
        return OCRResult(lines=lines, elapse=elapse)
