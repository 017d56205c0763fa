"""OCR model zoo in flax (reference: rag/ingest/ocr/networks/ — torch
backbone/neck/head compositions, SURVEY.md §2.7 #45).

Compact architectures sized for TPU-friendly shapes (all dims
multiples of 8/128 where it matters):

- :class:`DBDetector` — DBNet-style text segmentation: conv backbone with
  stride-2 stages, FPN-lite top-down fusion, differentiable-binarization
  head emitting a probability map at 1/2 input resolution.
- :class:`OrientationClassifier` — small convnet, 2 classes (0°/180°).
- Recognizer zoo (``make_recognizer``, three families — reference ships
  its torch zoo in networks/backbones/__init__.py:18-66):
  :class:`CTCRecognizer` (conv + attention column mixer),
  :class:`SVTRRecognizer` (transformer mixer, SVTR family),
  :class:`CRNNRecognizer` (bidirectional parallel-scan linear
  recurrence — the CRNN/BiLSTM family, TPU-first).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv_bn_act(x, features, *, stride=1, name_prefix="", kernel=3):
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride), padding="SAME",
                use_bias=False)(x)
    x = nn.GroupNorm(num_groups=min(8, features))(x)
    return nn.relu(x)


class _Backbone(nn.Module):
    """4-stage conv backbone; returns feature maps at 1/2..1/16."""

    width: int = 16

    @nn.compact
    def __call__(self, x):
        feats = []
        w = self.width
        for stage in range(4):
            x = _conv_bn_act(x, w * (2**stage), stride=2)
            x = _conv_bn_act(x, w * (2**stage))
            feats.append(x)
        return feats


class DBDetector(nn.Module):
    """Text-region probability map (reference det: DBNet,
    ch_ppocr_det — SURVEY.md §2.7 #40)."""

    width: int = 16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images [B, H, W, C] in [0,1] → prob map [B, H/2, W/2]."""
        feats = _Backbone(self.width, name="backbone")(images)
        # FPN-lite: unify channels, top-down upsample + add
        fpn_w = self.width * 2
        laterals = [
            nn.Conv(fpn_w, (1, 1), name=f"lateral_{i}")(f) for i, f in enumerate(feats)
        ]
        y = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            b, h, w, c = laterals[i].shape
            y = jax.image.resize(y, (b, h, w, c), "nearest") + laterals[i]
        y = _conv_bn_act(y, fpn_w)
        logits = nn.Conv(1, (3, 3), padding="SAME", name="db_head")(y)
        return nn.sigmoid(logits[..., 0])


class OrientationClassifier(nn.Module):
    """0°/180° crop classifier (reference cls: ch_ppocr_cls — §2.7 #41).

    Pools over width only: the vertical ink profile (ascender/descender
    asymmetry) is the 0-vs-180 signal, and global mean pooling erases it
    (measured: loss plateaus at ~0.5 with full pooling vs 0.2 with the
    height-preserving head on identical data)."""

    width: int = 16

    @nn.compact
    def __call__(self, crops: jax.Array) -> jax.Array:
        """crops [B, H, W, C] → logits [B, 2]."""
        x = crops
        for stage in range(3):
            x = _conv_bn_act(x, self.width * (2**stage), stride=2)
        x = jnp.mean(x, axis=2)  # [B, H/8, C] — keep the vertical profile
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(64)(x)
        x = nn.relu(x)
        return nn.Dense(2)(x)


class CTCRecognizer(nn.Module):
    """Sequence recognizer with CTC output (reference rec:
    ch_ppocr_rec CTC head — §2.7 #42). Input height fixed (e.g. 32);
    width maps to sequence columns at 1/(2·col_stride) downsampling.

    ``col_stride=1`` halves the column stride (W/2 frames instead of
    W/4): at 32-px crops a narrow glyph (i, l, :) spans ~6-9 px — one
    or two W/4 frames — and CTC collapses it into its neighbor
    ('Quantity'→'Quantty', measured on clean crops). W/2 gives every
    glyph ≥3 frames. The attention mixer has no positional encoding,
    so longer inference sequences extrapolate freely."""

    vocab_size: int  # excluding blank; blank id = vocab_size
    width: int = 32
    col_stride: int = 2

    @nn.compact
    def __call__(self, crops: jax.Array) -> jax.Array:
        """crops [B, H, W, C] → logits [B, W/(2·col_stride), vocab+1]."""
        x = _conv_bn_act(crops, self.width)
        x = _conv_bn_act(x, self.width, stride=2)  # H/2, W/2
        x = _conv_bn_act(x, self.width * 2)
        x = nn.Conv(
            self.width * 2, (3, 3), strides=(2, self.col_stride),
            padding="SAME",
        )(x)
        x = nn.relu(x)  # H/4, W/(2·col_stride)
        # collapse height into channels → column sequence
        b, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, w, h * c)
        x = nn.Dense(self.width * 4)(x)
        x = nn.relu(x)
        # column mixer: small self-attention over the sequence axis
        attn = nn.MultiHeadDotProductAttention(
            num_heads=4, qkv_features=self.width * 4, name="column_attn"
        )(x)
        x = nn.LayerNorm()(x + attn)
        return nn.Dense(self.vocab_size + 1, name="ctc_head")(x)


class SVTRRecognizer(nn.Module):
    """SVTR-style single-vision-model recognizer (Du et al. 2022,
    "SVTR: Scene Text Recognition with a Single Visual Model") — the
    architecture family the reference's model zoo ships as rec_svtrnet
    (arch_config.yaml; §2.7 #45). TPU-first simplifications: the conv
    patch stem downsamples to H/4 columns, height folds into channels,
    and ``depth`` pre-norm transformer blocks (MHSA over the column
    sequence + GELU MLP) do the global mixing — the paper's local-mixing
    blocks are windowed attention, which at 32-px crops (8 rows after
    the stem) is indistinguishable from the depthwise-conv local mixing
    the stem already provides, so the columns-only global mixer keeps
    every op MXU-shaped with no positional encoding (free length
    extrapolation, same property the conv recognizer documents).

    Same I/O contract as :class:`CTCRecognizer`: crops ``[B, 32, W, 3]``
    → logits ``[B, W/(2·col_stride), vocab+1]`` — the pipeline, trainer,
    beam decode and bundle persistence are arch-agnostic."""

    vocab_size: int  # excluding blank; blank id = vocab_size
    width: int = 64  # embedding dim
    depth: int = 3
    heads: int = 4
    col_stride: int = 2

    @nn.compact
    def __call__(self, crops: jax.Array) -> jax.Array:
        x = _conv_bn_act(crops, self.width // 2, stride=2)  # H/2, W/2
        x = nn.Conv(
            self.width, (3, 3), strides=(2, self.col_stride), padding="SAME"
        )(x)
        x = nn.relu(x)  # H/4, W/(2·col_stride)
        b, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, w, h * c)
        x = nn.Dense(self.width)(x)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln_attn_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.width,
                name=f"mixer_{i}",
            )(y)
            x = x + y
            y = nn.LayerNorm(name=f"ln_mlp_{i}")(x)
            y = nn.Dense(self.width * 4, name=f"mlp_up_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.width, name=f"mlp_down_{i}")(y)
            x = x + y
        x = nn.LayerNorm(name="ln_out")(x)
        return nn.Dense(self.vocab_size + 1, name="ctc_head")(x)


class _LinearRecurrence(nn.Module):
    """Gated linear recurrence over the column axis, evaluated as a
    parallel ``associative_scan``: h_t = a_t⊙h_{t−1} + (1−a_t)⊙v_t with
    a_t = σ(gate(x_t)+1). The composition (a₂,b₂)∘(a₁,b₁) =
    (a₂·a₁, a₂·b₁+b₂) is associative, so the recurrence runs in
    O(log W) device steps instead of W sequential ones — the minGRU/SSM
    observation, applied to the CRNN neck."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # +1 gate bias starts the recurrence remembering (~σ(1)≈0.73)
        a = nn.sigmoid(nn.Dense(self.features, name="gate")(x) + 1.0)
        b = (1.0 - a) * nn.Dense(self.features, name="value")(x)

        def comb(c1, c2):
            a1, b1 = c1
            a2, b2 = c2
            return a2 * a1, a2 * b1 + b2

        _, h = jax.lax.associative_scan(comb, (a, b), axis=1)
        return h


class _BiRecurrence(nn.Module):
    """Bidirectional recurrent column mixer: forward + reversed linear
    recurrences, concatenated and mixed — the TPU-shaped stand-in for
    the BiLSTM neck of the CRNN family."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fwd = _LinearRecurrence(self.features, name="fwd")(x)
        bwd = _LinearRecurrence(self.features, name="bwd")(x[:, ::-1])[:, ::-1]
        return nn.Dense(self.features, name="mix")(
            jnp.concatenate([fwd, bwd], axis=-1)
        )


class CRNNRecognizer(nn.Module):
    """CRNN-family recognizer (conv features → recurrent column mixer →
    CTC) — the classic rec architecture family of the reference zoo
    (rag/ingest/ocr/networks/backbones/__init__.py:18-66 ships it as
    the MobileNetV3/ResNet + BiLSTM ``rec`` composition; §2.7 #45).

    TPU-first re-design: a sequential BiLSTM serializes W steps on
    device, so the neck is a bidirectional GATED LINEAR RECURRENCE run
    with ``lax.associative_scan`` — O(log W) depth, every op MXU/VPU
    shaped, the same inductive bias (ordered accumulation along the
    column axis, unbounded horizon, direction-aware) without
    attention's O(W²) or the scan serialization.

    Same I/O contract as the other zoo recognizers: crops
    ``[B, rec_h, W, 3]`` → logits ``[B, W/(2·col_stride), vocab+1]`` —
    pipeline, trainer, beam decode and persistence are arch-agnostic."""

    vocab_size: int  # excluding blank; blank id = vocab_size
    width: int = 64
    depth: int = 2
    col_stride: int = 2

    @nn.compact
    def __call__(self, crops: jax.Array) -> jax.Array:
        x = _conv_bn_act(crops, self.width // 2)
        x = _conv_bn_act(x, self.width // 2, stride=2)  # H/2, W/2
        x = nn.Conv(
            self.width, (3, 3), strides=(2, self.col_stride), padding="SAME"
        )(x)
        x = nn.relu(x)  # H/4, W/(2·col_stride)
        b, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, w, h * c)
        x = nn.Dense(self.width)(x)
        for i in range(self.depth):
            y = _BiRecurrence(self.width, name=f"birnn_{i}")(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x + y)
        return nn.Dense(self.vocab_size + 1, name="ctc_head")(x)


def make_recognizer(
    arch: str, vocab_size: int, width: int, col_stride: int = 2
):
    """Recognizer zoo dispatch: ``conv`` (CTCRecognizer — the shipped
    default), ``svtr`` (SVTRRecognizer) or ``crnn`` (CRNNRecognizer)."""
    if arch == "conv":
        return CTCRecognizer(
            vocab_size=vocab_size, width=width, col_stride=col_stride
        )
    if arch == "svtr":
        # SVTR width constraints: the stem's GroupNorm needs width/2
        # divisible by its 8 groups and MHSA needs width divisible by
        # 4 heads — round up to a multiple of 16 (min 32)
        w = -(-max(width, 32) // 16) * 16
        return SVTRRecognizer(
            vocab_size=vocab_size, width=w, col_stride=col_stride,
        )
    if arch == "crnn":
        # same GroupNorm constraint on the width//2 stem
        w = -(-max(width, 32) // 16) * 16
        return CRNNRecognizer(
            vocab_size=vocab_size, width=w, col_stride=col_stride,
        )
    raise ValueError(f"unknown recognizer arch {arch!r} (conv | svtr | crnn)")


@dataclasses.dataclass
class OCRModelBundle:
    """Initialized models + params for the pipeline."""

    det: DBDetector
    det_params: dict
    cls: OrientationClassifier
    cls_params: dict
    rec: "CTCRecognizer | SVTRRecognizer | CRNNRecognizer"
    rec_params: dict
    charset: str  # rec vocab, index = class id
    # recognizer crop height: crops are SAMPLED from the source image at
    # this height (pipeline crop_quad/tighten_crop), so raising it keeps
    # real glyph detail ($, commas at small font sizes drop at 32 px);
    # the cls path always downsizes its batch to 32 (cls params are
    # height-bound), the conv/svtr recognizers adapt (height collapses
    # into the column features at init time).
    rec_h: int = 32

    @classmethod
    def create(
        cls, charset: str, seed: int = 0, width: int = 16,
        rec_width: int | None = None, rec_col_stride: int = 2,
        rec_arch: str = "conv", rec_h: int = 32,
    ) -> "OCRModelBundle":
        rng = jax.random.PRNGKey(seed)
        det = DBDetector(width)
        det_params = det.init(rng, jnp.zeros((1, 64, 64, 3)))
        cls_model = OrientationClassifier(width)
        cls_params = cls_model.init(rng, jnp.zeros((1, 32, 64, 3)))
        rec = make_recognizer(
            rec_arch, len(charset), rec_width or width * 2,
            col_stride=rec_col_stride,
        )
        rec_params = rec.init(rng, jnp.zeros((1, rec_h, 64, 3)))
        return cls(
            det, det_params, cls_model, cls_params, rec, rec_params,
            charset, rec_h,
        )

    # ---------------- artifact persistence ----------------

    def save(self, path) -> None:
        """Serialize trained params + charset to one ``.npz`` artifact
        (the TPU-framework equivalent of the reference's downloaded ONNX
        model files, inference_engine/base.py:82-144)."""
        import json
        from pathlib import Path

        import flax.serialization as ser
        import numpy as np

        meta = json.dumps({
            "charset": self.charset,
            "width": self._width(),
            "rec_width": self.rec.width,
            "rec_stride": self.rec.col_stride,
            "rec_arch": (
                "svtr"
                if isinstance(self.rec, SVTRRecognizer)
                else "crnn"
                if isinstance(self.rec, CRNNRecognizer)
                else "conv"
            ),
            "rec_h": self.rec_h,
        })
        np.savez_compressed(
            Path(path),
            meta=np.frombuffer(meta.encode("utf-8"), np.uint8),
            det=np.frombuffer(ser.to_bytes(self.det_params), np.uint8),
            cls=np.frombuffer(ser.to_bytes(self.cls_params), np.uint8),
            rec=np.frombuffer(ser.to_bytes(self.rec_params), np.uint8),
        )

    def _width(self) -> int:
        return self.det.width

    @classmethod
    def load(cls, path) -> "OCRModelBundle":
        import json

        import flax.serialization as ser
        import numpy as np

        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
            bundle = cls.create(
                meta["charset"], width=meta["width"],
                rec_width=meta.get("rec_width", meta["width"] * 2),
                rec_col_stride=meta.get("rec_stride", 2),
                rec_arch=meta.get("rec_arch", "conv"),
                rec_h=meta.get("rec_h", 32),
            )
            det_p = ser.from_bytes(bundle.det_params, z["det"].tobytes())
            cls_p = ser.from_bytes(bundle.cls_params, z["cls"].tobytes())
            rec_p = ser.from_bytes(bundle.rec_params, z["rec"].tobytes())
        import jax

        # pin to device once: from_bytes yields host numpy leaves, and
        # jitted calls with numpy params re-upload the full state every
        # invocation (~1 s/call on the TPU tunnel for MB-scale bundles)
        det_p, cls_p, rec_p = jax.device_put((det_p, cls_p, rec_p))
        return cls(
            bundle.det, det_p, bundle.cls, cls_p, bundle.rec, rec_p,
            meta["charset"], meta.get("rec_h", 32),
        )
