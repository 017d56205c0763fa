"""OCR engine — TPU-native rebuild of the reference's vendored RapidOCR
(reference: rag/ingest/ocr/, ~8.1k LoC — SURVEY.md §2.7).

Pipeline parity: det (DBNet-style segmentation) → cls (0°/180°) →
rec (CTC), with pre/post-processing contracts matching the reference:
DB bitmap→boxes postprocess, aspect-sorted recognition batching, CTC
argmax+dedup decode, markdown layout reconstruction.

TPU-first split: all model forwards are flax modules running batched on
the MXU (the reference runs ONNXRuntime/OpenVINO/Paddle/torch on CPU —
§2.7 #44); geometry (connected components, min-area rects, crops) is
host-side NumPy/SciPy (the reference uses OpenCV/pyclipper C++ — §7.2
step 9 sanctions host-side geometry).
"""

from .pipeline import OCREngine, OCRResult  # noqa: F401
