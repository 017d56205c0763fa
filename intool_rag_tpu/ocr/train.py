"""OCR training: synthetic pages → trained det/cls/rec models.

No pretrained OCR weights are shippable offline, so the framework owns
its training loops (the reference only runs inference on downloaded
models — SURVEY.md §2.7 #44): the DB detector trains on rendered pages
(balanced BCE + dice on the shrunk-quad probability map), the
orientation classifier on 0°/180° crops, and the CTC recognizer on
rendered strings. ``train_full_ocr`` produces a complete
:class:`OCRModelBundle` savable as one artifact; the repo ships one at
``ocr/weights/default.npz`` (see OCREngine).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..logging import get_logger
from .models import CTCRecognizer, DBDetector, OrientationClassifier, make_recognizer

logger = get_logger(__name__)


def render_text_image(
    text: str, *, height: int = 32, font_size: int = 22
) -> np.ndarray:
    """Render text to an RGB float crop [height, W, 3] in [0, 1], white
    background / dark ink — the same polarity page crops have after
    ``crop_quad``, so recognizer training and serving see one input
    distribution."""
    from .postprocess import resize_norm_crop
    from .synth import render_line

    ink = render_line(text, font_size=font_size)
    crop = np.repeat((1.0 - ink)[:, :, None], 3, axis=2)
    return resize_norm_crop(crop, target_h=height, max_w=4096)[
        :, : max(8, int(round(ink.shape[1] * height / ink.shape[0])))
    ]


def _pad_batch(images: list[np.ndarray], width_mult: int = 32) -> np.ndarray:
    h = images[0].shape[0]
    max_w = max(im.shape[1] for im in images)
    max_w = -(-max_w // width_mult) * width_mult
    out = np.zeros((len(images), h, max_w, 3), np.float32)
    for i, im in enumerate(images):
        out[i, :, : im.shape[1]] = im[:, :max_w]
    return out


def train_synthetic_detector(
    charset: str,
    *,
    steps: int = 400,
    batch: int = 4,
    page_size: int = 448,
    width: int = 16,
    seed: int = 0,
    lr: float = 1.5e-3,
    max_rotation: float = 15.0,
    rot90_frac: float = 0.15,
    init_params=None,
):
    """Train DBDetector on synthetic pages. Each batch mixes upright
    pages with rotated ones (uniform ±max_rotation plus occasional 90°)
    so the prob map learns oriented text. Pass ``init_params`` to
    continue training shipped weights. Returns (model, params, losses)."""
    from .synth import gt_prob_map, render_page

    rng = np.random.default_rng(seed)
    model = DBDetector(width)
    params = init_params or model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, page_size, page_size, 3))
    )
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, images, targets):
        def loss_fn(p):
            prob = model.apply(p, images)  # [B, H/2, W/2]
            prob = jnp.clip(prob, 1e-6, 1 - 1e-6)
            pos = targets
            # balanced BCE: text pixels are ~5-15% of the page
            n_pos = jnp.maximum(pos.sum(), 1.0)
            n_neg = jnp.maximum((1 - pos).sum(), 1.0)
            w_pos = n_neg / n_pos
            bce = -(w_pos * pos * jnp.log(prob) + (1 - pos) * jnp.log(1 - prob))
            bce = bce.sum() / (w_pos * n_pos + n_neg)
            inter = (prob * pos).sum()
            dice = 1.0 - 2.0 * inter / (prob.sum() + pos.sum() + 1.0)
            return bce + dice

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for step in range(steps):
        imgs, maps = [], []
        for _ in range(batch):
            r = rng.random()
            if r < 1.0 - rot90_frac - 0.40:
                rot = 0.0
            elif r < 1.0 - rot90_frac:
                rot = float(rng.uniform(-max_rotation, max_rotation))
            else:
                rot = float(rng.choice([90.0, -90.0]))
            img, gt = render_page(
                rng, charset, size=page_size, rotation=rot,
                per_line_jitter=1.0, font_sizes=(14, 48),
            )
            from .synth import degrade_page

            img = degrade_page(rng, img, p_blur=0.3, p_jpeg=0.3)
            imgs.append(img)
            maps.append(gt_prob_map(gt, page_size))
        params, opt_state, loss = step_fn(
            params, opt_state,
            jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(maps)),
        )
        losses.append(float(loss))
        if step % 50 == 0:
            logger.info("det step %d loss %.4f", step, losses[-1])
    return model, params, losses


def train_synthetic_classifier(
    charset: str,
    *,
    steps: int = 200,
    batch: int = 32,
    width: int = 16,
    seed: int = 0,
    lr: float = 2e-3,
):
    """Train the 0°/180° OrientationClassifier on rendered line crops
    (reference capability: ch_ppocr_cls — §2.7 #41). Returns (model,
    params, losses)."""
    from .synth import DEFAULT_FONTS, random_text, render_line

    rng = np.random.default_rng(seed)
    model = OrientationClassifier(width)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 64, 3)))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, images, labels):
        def loss_fn(p):
            logits = model.apply(p, images)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    from .postprocess import resize_norm_crop

    for step in range(steps):
        images = np.zeros((batch, 32, 160, 3), np.float32)
        labels = np.zeros(batch, np.int32)
        for i in range(batch):
            text = random_text(rng, charset, 4, 10)
            fs = int(rng.integers(16, 32))
            font = DEFAULT_FONTS[int(rng.integers(0, len(DEFAULT_FONTS)))]
            ink = render_line(text, font_path=font, font_size=fs)
            h0 = ink.shape[0]
            ink = np.pad(  # mild tightened-crop jitter (see rec aug note)
                ink,
                (
                    (int(rng.integers(0, max(1, int(0.12 * h0)))),
                     int(rng.integers(0, max(1, int(0.12 * h0))))),
                    (int(rng.integers(0, max(1, int(0.06 * h0)))),
                     int(rng.integers(0, max(1, int(0.06 * h0))))),
                ),
            )
            crop = 1.0 - ink * float(rng.uniform(0.6, 1.0))
            crop = np.clip(
                crop + rng.normal(0, 0.04, crop.shape).astype(np.float32), 0, 1
            )
            crop3 = np.repeat(crop[:, :, None], 3, axis=2)
            flip = int(rng.random() < 0.5)
            if flip:
                crop3 = np.rot90(crop3, 2).copy()
            r = resize_norm_crop(crop3, target_h=32, max_w=160)
            images[i] = r
            labels[i] = flip
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses.append(float(loss))
    return model, params, losses


def train_full_ocr(
    charset: str | None = None,
    *,
    det_steps: int = 500,
    cls_steps: int = 800,
    rec_steps: int = 8000,
    width: int = 16,
    seed: int = 0,
):
    """Train all three OCR stages and return a complete
    :class:`~intool_rag_tpu.ocr.models.OCRModelBundle` (save with
    ``bundle.save(path)``; the shipped artifact is built by
    ``python -m intool_rag_tpu.ocr.train``)."""
    from .models import OCRModelBundle
    from .synth import build_charset

    charset = charset or build_charset()
    logger.info("training OCR: charset=%d classes", len(charset))
    det, det_params, det_losses = train_synthetic_detector(
        charset, steps=det_steps, width=width, seed=seed
    )
    logger.info("det final loss %.4f", det_losses[-1])
    cls_m, cls_params, cls_losses = train_synthetic_classifier(
        charset, steps=cls_steps, width=width, seed=seed
    )
    logger.info("cls final loss %.4f", cls_losses[-1])
    rec, rec_params, _, rec_losses = train_synthetic_recognizer(
        charset, steps=rec_steps, width=width * 2, seed=seed,
        min_len=3, max_len=12, batch=32,
    )
    logger.info("rec final loss %.4f", rec_losses[-1])
    return OCRModelBundle(
        det, det_params, cls_m, cls_params, rec, rec_params, charset
    )


def train_synthetic_recognizer(
    charset: str = "0123456789",
    *,
    steps: int = 300,
    batch: int = 16,
    min_len: int = 3,
    max_len: int = 6,
    width: int = 32,
    seed: int = 0,
    lr: float = 2e-3,
    init_params=None,
    augment: bool = True,
    arch: str = "conv",
):
    """Train a recognizer (``arch``: conv | svtr | crnn — models.make_recognizer)
    on rendered random strings from ``charset``,
    with font/size/contrast/noise augmentation so it generalizes to
    detector crops (``augment=False`` renders clean fixed-font crops —
    used by the fast convergence unit test; shipped weights always train
    augmented). Pass ``init_params`` to continue training shipped
    weights. Returns (model, params, charset, losses)."""
    from .postprocess import resize_norm_crop
    from .synth import DEFAULT_FONTS, render_line

    rng = np.random.default_rng(seed)
    model = make_recognizer(arch, len(charset), width)
    params = init_params or model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 64, 3))
    )
    # CTC must escape the all-blank saddle before the LR collapses:
    # cosine decay over a short run stalls there (measured: 250 steps
    # land at loss ~12/empty decodes under cosine vs 0.02 at constant
    # lr). Long runs do benefit from the polish of a decaying tail.
    if steps >= 2000:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=max(20, steps // 20),
            decay_steps=steps, end_value=lr * 0.01,
        )
    else:
        schedule = lr
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)
    blank = len(charset)

    def render_crop(text: str) -> np.ndarray:
        if not augment:
            ink = render_line(text, font_size=22)
            crop = 1.0 - ink
            crop3 = np.repeat(crop[:, :, None], 3, axis=2)
            w = max(8, int(round(crop.shape[1] * 32 / crop.shape[0])))
            return resize_norm_crop(crop3, target_h=32, max_w=4096)[:, :w]
        fs = int(rng.integers(16, 30))
        font = DEFAULT_FONTS[int(rng.integers(0, len(DEFAULT_FONTS)))]
        ink = render_line(text, font_path=font, font_size=fs)
        # mild framing jitter: serving crops are ink-tightened
        # (postprocess.tighten_crop) with ~8% residual margin — train on
        # that geometry, not on raw detector-strip margins (large random
        # margins measurably stall cls/rec convergence)
        h0, w0 = ink.shape
        mt = int(rng.integers(0, max(1, int(0.12 * h0))))
        mb = int(rng.integers(0, max(1, int(0.12 * h0))))
        ml = int(rng.integers(0, max(1, int(0.06 * h0))))
        mr = int(rng.integers(0, max(1, int(0.06 * h0))))
        ink = np.pad(ink, ((mt, mb), (ml, mr)))
        darkness = float(rng.uniform(0.6, 1.0))
        crop = 1.0 - ink * darkness
        crop = np.clip(
            crop + rng.normal(0, 0.04, crop.shape).astype(np.float32), 0, 1
        )
        crop3 = np.repeat(crop[:, :, None], 3, axis=2)
        w = max(8, int(round(crop.shape[1] * 32 / crop.shape[0])))
        return resize_norm_crop(crop3, target_h=32, max_w=4096)[:, :w]

    @jax.jit
    def step_fn(params, opt_state, images, labels, label_pad):
        def loss_fn(p):
            logits = model.apply(p, images)  # [B, T, V+1]
            logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
            loss = optax.ctc_loss(
                logits, logit_pad, labels, label_pad, blank_id=blank
            )
            return loss.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    from .synth import random_text

    losses = []
    for _ in range(steps):
        texts = [
            random_text(rng, charset, min_len, max_len) for _ in range(batch)
        ]
        images = _pad_batch([render_crop(t) for t in texts])
        max_l = max(len(t) for t in texts)
        labels = np.full((batch, max_l), 0, np.int32)
        label_pad = np.ones((batch, max_l), np.float32)
        for i, t in enumerate(texts):
            labels[i, : len(t)] = [charset.index(c) for c in t]
            label_pad[i, : len(t)] = 0.0
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels),
            jnp.asarray(label_pad),
        )
        losses.append(float(loss))
    return model, params, charset, losses


if __name__ == "__main__":
    # Build the shipped artifact: python -m intool_rag_tpu.ocr.train [out]
    import sys
    from pathlib import Path

    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).parent / "weights" / "default.npz"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    bundle = train_full_ocr()
    bundle.save(out)
    print(f"saved {out} ({out.stat().st_size / 1e6:.2f} MB)")


def train_recognizer_cached(
    charset: str,
    *,
    pool_size: int = 16384,
    steps: int = 40_000,
    batch: int = 32,
    crop_w: int = 320,
    max_len: int = 12,
    min_len: int = 3,
    width: int = 32,
    seed: int = 0,
    lr: float = 1.5e-3,
    init_params=None,
    steps_per_launch: int = 100,
    col_stride: int = 2,
    text_sampler=None,
    font_probs=None,
    arch: str = "conv",
    rec_h: int = 32,
):
    """TPU-first recognizer training: render an augmented crop pool ONCE
    (host PIL rendering is the wall-clock bottleneck of the per-step
    trainer — ~50 min / 12k steps), park it in device memory at a fixed
    [pool, 32, crop_w, 3] shape, and run ``steps_per_launch`` optimizer
    steps per device launch with ``lax.scan`` sampling random batches
    from the pool — amortizing the ~40 ms remote-tunnel RPC the same way
    the search benchmarks do (ARCHITECTURE.md §8). ~10× faster wall
    clock than the per-step trainer at equal step count."""
    from .postprocess import resize_norm_crop
    from .synth import DEFAULT_FONTS, random_text, render_line

    rng = np.random.default_rng(seed)
    model = make_recognizer(
        arch, len(charset), width, col_stride=col_stride
    )
    params = init_params or model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, rec_h, 64, 3))
    )
    blank = len(charset)

    # ---- render the pool (host, once) ----
    # serif is upweighted: its hairline strokes at 32-px height are the
    # measured weak spot of a uniformly-sampled pool (reads 'Invoice'
    # as 'voce' while sans/mono read clean)
    if font_probs is None:
        font_probs = np.array([0.15, 0.13, 0.25, 0.13, 0.21, 0.13])[
            : len(DEFAULT_FONTS)
        ]
    font_probs = np.asarray(font_probs, np.float64)
    font_probs = font_probs / font_probs.sum()
    pool = np.zeros((pool_size, rec_h, crop_w, 3), np.float32)
    labels = np.zeros((pool_size, max_len), np.int32)
    label_pad = np.ones((pool_size, max_len), np.float32)
    # text mix: half word-like lines (latin words, digit groups, prices,
    # dates — the distribution of real document text, which the engine's
    # primary PDF/invoice workload is), half uniform-random multiscript
    # strings (full charset coverage). An all-random pool teaches a
    # multiscript prior that misreads plain ASCII words (measured:
    # 'Total due 1250' → 'Total de 15' with hallucinated Cyrillic).
    # Crops are produced by the SERVING pipeline itself: render full
    # pages (upright, tilted, 90-degree), push the ground-truth quads
    # through crop_quad + tighten_crop — the exact geometry detector
    # crops see (page compositing, quad resampling, ink tightening).
    # Directly-rendered crops leave a train/serve distribution gap that
    # measurably flips reads on detector crops.
    from .postprocess import QuadBox, crop_quad, tighten_crop
    from .synth import render_page, wordlike_text

    def gen_texts(n):
        out = []
        for _ in range(n):
            if text_sampler is not None:
                t = text_sampler(rng)
                if t is not None:
                    out.append(str(t)[:max_len])
                    continue
            if rng.random() < 0.5:
                out.append(wordlike_text(rng, charset, max_len))
            else:
                out.append(random_text(rng, charset, min_len, max_len)[:max_len])
        return out

    i = 0
    while i < pool_size:
        texts = gen_texts(int(rng.integers(4, 8)))
        r = rng.random()
        rot = 0.0
        if r > 0.85:
            rot = float(rng.choice([90.0, -90.0]))
        elif r > 0.45:
            rot = float(rng.uniform(-15.0, 15.0))
        page, gt = render_page(
            rng, charset, size=448, texts=texts, rotation=rot,
            font_sizes=(14, 44), noise=float(rng.uniform(0.0, 0.03)),
            font_probs=font_probs,
        )
        from .synth import degrade_page

        page = degrade_page(rng, page, p_blur=0.35, p_jpeg=0.35)
        for quad_pts, text in gt:
            if i >= pool_size or not text:
                continue
            crop = tighten_crop(
                crop_quad(page, QuadBox(quad_pts, 1.0), target_h=rec_h),
                target_h=rec_h,
            )
            if crop.ndim != 3 or crop.shape[0] != rec_h or crop.size == 0:
                continue
            if crop.shape[1] > crop_w:  # truncating would corrupt labels
                continue
            r2 = crop
            pool[i, :, : r2.shape[1]] = r2
            labels[i, : len(text)] = [charset.index(c) for c in text]
            label_pad[i, : len(text)] = 0.0
            i += 1
            if i % 4096 == 0:
                logger.info("pool render %d/%d", i, pool_size)

    pool_d = jnp.asarray(pool)
    labels_d = jnp.asarray(labels)
    lpad_d = jnp.asarray(label_pad)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(50, steps // 50),
        decay_steps=steps, end_value=lr * 0.02,
    )
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    @jax.jit
    def launch(params, opt_state, key, pool, labels, lpad):
        def one_step(carry, key_t):
            params, opt_state = carry
            ki, kc, kb, kn, ks = jax.random.split(key_t, 5)
            idx = jax.random.randint(ki, (batch,), 0, pool_size)
            images = pool[idx]
            lab = labels[idx]
            lp = lpad[idx]
            # device-side augmentation: each pool crop is reused ~150×
            # over a 40k-step run — contrast/brightness jitter + fresh
            # noise per visit keeps that from memorizing pixel values
            contrast = jax.random.uniform(kc, (batch, 1, 1, 1), minval=0.8,
                                          maxval=1.15)
            bright = jax.random.uniform(kb, (batch, 1, 1, 1), minval=-0.08,
                                        maxval=0.08)
            images = jnp.clip(
                (images - 1.0) * contrast + 1.0 + bright
                + 0.02 * jax.random.normal(kn, images.shape),
                0.0, 1.0,
            )
            # random blur: serving crops are resampled twice (page
            # compose + rotated quad crop), which softens strokes the
            # directly-rendered pool keeps crisp — measured to flip
            # clean-crop reads ('Total due 1250' → 'Total de 5') when
            # absent. 3×3 tent blur at random per-crop strength.
            blurred = (
                4.0 * images
                + 2.0 * (jnp.roll(images, 1, 1) + jnp.roll(images, -1, 1)
                         + jnp.roll(images, 1, 2) + jnp.roll(images, -1, 2))
                + (jnp.roll(jnp.roll(images, 1, 1), 1, 2)
                   + jnp.roll(jnp.roll(images, 1, 1), -1, 2)
                   + jnp.roll(jnp.roll(images, -1, 1), 1, 2)
                   + jnp.roll(jnp.roll(images, -1, 1), -1, 2))
            ) / 16.0
            a = jax.random.uniform(ks, (batch, 1, 1, 1), minval=0.0, maxval=0.85)
            images = (1.0 - a) * images + a * blurred
            # horizontal compression (compress-only keeps labels intact:
            # text never leaves the canvas): serving crops arrive at
            # arbitrary aspect from quad geometry; reads were measured
            # to flip under ±10% width rescales without this
            kw = jax.random.fold_in(ks, 1)
            scale = jax.random.uniform(kw, (batch, 1), minval=0.78, maxval=1.0)
            src = jnp.arange(crop_w, dtype=jnp.float32)[None, :] / scale
            src_i = jnp.clip(src.astype(jnp.int32), 0, crop_w - 1)
            gather_idx = jnp.broadcast_to(
                src_i[:, None, :, None], images.shape
            )
            stretched = jnp.take_along_axis(images, gather_idx, axis=2)
            # past-the-end columns sample the (black-padded) tail, which
            # is already the pad value — no masking needed
            use = jax.random.uniform(
                jax.random.fold_in(kw, 2), (batch, 1, 1, 1)
            ) < 0.5
            images = jnp.where(use, stretched, images)

            def loss_fn(p):
                logits = model.apply(p, images)
                logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
                return optax.ctc_loss(
                    logits, logit_pad, lab, lp, blank_id=blank
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        keys = jax.random.split(key, steps_per_launch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses

    losses: list[float] = []
    n_launches = -(-steps // steps_per_launch)
    for li in range(n_launches):
        params, opt_state, batch_losses = launch(
            params, opt_state, jax.random.PRNGKey(seed * 7919 + li),
            pool_d, labels_d, lpad_d,
        )
        losses.extend(np.asarray(batch_losses).tolist())
        if li % 20 == 0:
            recent = float(np.mean(losses[-steps_per_launch:]))
            logger.info(
                "rec cached launch %d/%d mean loss %.4f", li, n_launches, recent
            )
    return model, params, charset, losses


def train_classifier_cached(
    charset: str,
    *,
    pool_size: int = 16384,
    steps: int = 12_000,
    batch: int = 64,
    crop_w: int = 192,
    width: int = 16,
    seed: int = 0,
    lr: float = 1.5e-3,
    steps_per_launch: int = 100,
):
    """Cached-pool trainer for the 0°/180° OrientationClassifier, with
    the SAME device-side augmentation as the recognizer (contrast,
    brightness, noise, blur, horizontal compression). A classifier
    trained on crisp host-rendered crops false-flips serving crops
    (measured: 'Invoice 2026' read upside-down as '9zoz eэ[oΛu' —
    the resampling blur of quad crops is out of its distribution)."""
    from .postprocess import resize_norm_crop
    from .synth import DEFAULT_FONTS, random_text, render_line, wordlike_text

    rng = np.random.default_rng(seed)
    model = OrientationClassifier(width)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 64, 3)))

    font_probs = np.array([0.15, 0.13, 0.25, 0.13, 0.21, 0.13])[
        : len(DEFAULT_FONTS)
    ]
    font_probs = font_probs / font_probs.sum()
    pool = np.zeros((pool_size, rec_h, crop_w, 3), np.float32)
    labels = np.zeros(pool_size, np.int32)
    for i in range(pool_size):
        if rng.random() < 0.5:
            text = wordlike_text(rng, charset, 10)
        else:
            text = random_text(rng, charset, 3, 10)[:10]
        fs = int(rng.integers(16, 30))
        font = DEFAULT_FONTS[int(rng.choice(len(DEFAULT_FONTS), p=font_probs))]
        ink = render_line(text, font_path=font, font_size=fs)
        h0 = ink.shape[0]
        ink = np.pad(
            ink,
            ((int(rng.integers(0, max(1, int(0.12 * h0)))),
              int(rng.integers(0, max(1, int(0.12 * h0))))),
             (int(rng.integers(0, max(1, int(0.06 * h0)))),
              int(rng.integers(0, max(1, int(0.06 * h0)))))),
        )
        crop = 1.0 - ink * float(rng.uniform(0.6, 1.0))
        crop3 = np.repeat(crop[:, :, None], 3, axis=2)
        flip = int(rng.random() < 0.5)
        if flip:
            crop3 = np.rot90(crop3, 2).copy()
        w = max(8, min(crop_w, int(round(crop3.shape[1] * 32 / crop3.shape[0]))))
        r = resize_norm_crop(crop3, target_h=32, max_w=crop_w)[:, :w]
        pool[i, :, : r.shape[1]] = r
        labels[i] = flip
        if i % 4096 == 0:
            logger.info("cls pool render %d/%d", i, pool_size)

    pool_d = jnp.asarray(pool)
    labels_d = jnp.asarray(labels)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(50, steps // 50),
        decay_steps=steps, end_value=lr * 0.02,
    )
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    @jax.jit
    def launch(params, opt_state, key, pool, labels):
        def one_step(carry, key_t):
            params, opt_state = carry
            ki, kc, kb, kn, ks = jax.random.split(key_t, 5)
            idx = jax.random.randint(ki, (batch,), 0, pool_size)
            images = pool[idx]
            lab = labels[idx]
            contrast = jax.random.uniform(kc, (batch, 1, 1, 1), minval=0.8, maxval=1.15)
            bright = jax.random.uniform(kb, (batch, 1, 1, 1), minval=-0.08, maxval=0.08)
            images = jnp.clip(
                (images - 1.0) * contrast + 1.0 + bright
                + 0.02 * jax.random.normal(kn, images.shape), 0.0, 1.0)
            blurred = (
                4.0 * images
                + 2.0 * (jnp.roll(images, 1, 1) + jnp.roll(images, -1, 1)
                         + jnp.roll(images, 1, 2) + jnp.roll(images, -1, 2))
                + (jnp.roll(jnp.roll(images, 1, 1), 1, 2)
                   + jnp.roll(jnp.roll(images, 1, 1), -1, 2)
                   + jnp.roll(jnp.roll(images, -1, 1), 1, 2)
                   + jnp.roll(jnp.roll(images, -1, 1), -1, 2))
            ) / 16.0
            a = jax.random.uniform(ks, (batch, 1, 1, 1), minval=0.0, maxval=0.85)
            images = (1.0 - a) * images + a * blurred
            kw = jax.random.fold_in(ks, 1)
            scale = jax.random.uniform(kw, (batch, 1), minval=0.78, maxval=1.0)
            src = jnp.arange(crop_w, dtype=jnp.float32)[None, :] / scale
            src_i = jnp.clip(src.astype(jnp.int32), 0, crop_w - 1)
            gather_idx = jnp.broadcast_to(src_i[:, None, :, None], images.shape)
            stretched = jnp.take_along_axis(images, gather_idx, axis=2)
            use = jax.random.uniform(
                jax.random.fold_in(kw, 2), (batch, 1, 1, 1)) < 0.5
            images = jnp.where(use, stretched, images)

            def loss_fn(p):
                logits = model.apply(p, images)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, lab).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        keys = jax.random.split(key, steps_per_launch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses

    losses: list[float] = []
    for li in range(-(-steps // steps_per_launch)):
        params, opt_state, bl = launch(
            params, opt_state, jax.random.PRNGKey(seed * 6311 + li),
            pool_d, labels_d)
        losses.extend(np.asarray(bl).tolist())
        if li % 20 == 0:
            logger.info("cls cached launch %d mean loss %.4f",
                        li, float(np.mean(losses[-steps_per_launch:])))
    return model, params, losses
