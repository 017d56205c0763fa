"""OCR training utilities: synthetic text rendering + CTC training.

No pretrained OCR weights are shippable offline, so the framework owns
its training loop (the reference only runs inference on downloaded
models — SURVEY.md §2.7 #44). The synthetic path doubles as the OCR
stack's end-to-end verification: render text with PIL, train the CTC
recognizer until it reads it back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models import CTCRecognizer


def render_text_image(
    text: str, *, height: int = 32, scale: int = 2, pad: int = 4
) -> np.ndarray:
    """Render text to an RGB float image [H, W, 3] in [0, 1] using PIL's
    built-in bitmap font (no font files needed)."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    dummy = Image.new("L", (8, 8))
    draw = ImageDraw.Draw(dummy)
    bbox = draw.textbbox((0, 0), text, font=font)
    w = max(8, bbox[2] - bbox[0] + 2 * pad)
    h = max(8, bbox[3] - bbox[1] + 2 * pad)
    img = Image.new("L", (w, h), 255)
    ImageDraw.Draw(img).text((pad - bbox[0], pad - bbox[1]), text, font=font, fill=0)
    img = img.resize((max(8, w * scale * height // (h * scale)), height))
    arr = 1.0 - np.asarray(img, np.float32) / 255.0  # ink = 1
    return np.repeat(arr[:, :, None], 3, axis=2)


def _pad_batch(images: list[np.ndarray], width_mult: int = 32) -> np.ndarray:
    h = images[0].shape[0]
    max_w = max(im.shape[1] for im in images)
    max_w = -(-max_w // width_mult) * width_mult
    out = np.zeros((len(images), h, max_w, 3), np.float32)
    for i, im in enumerate(images):
        out[i, :, : im.shape[1]] = im[:, :max_w]
    return out


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
):
    """Train CTCRecognizer on rendered random strings from ``charset``.
    Returns (model, params, charset)."""
    rng = np.random.default_rng(seed)
    model = CTCRecognizer(vocab_size=len(charset), width=width)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 64, 3)))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    blank = len(charset)

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

    losses = []
    for _ in range(steps):
        texts = [
            "".join(rng.choice(list(charset), size=rng.integers(min_len, max_len + 1)))
            for _ in range(batch)
        ]
        images = _pad_batch([render_text_image(t) for t in texts])
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
