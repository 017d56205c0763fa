"""Decoder LM training loop (next-token cross-entropy).

The contrastive trainer (`parallel/train.py`) covers the encoder; this
is the decoder-side counterpart — a compact optax/`lax.scan` loop used
two ways:

- fine-tuning/continued pretraining of `models/decoder.DecoderLM`
  checkpoints on packed token batches (the generic path);
- training the INDUCTION (copy) model that makes speculative-decoding
  acceptance measurable without downloadable weights: a 2-layer
  decoder learns the copy task ([prefix, SEP, prefix...]) in ~1k steps,
  after which its greedy continuation quotes its prompt — exactly the
  workload prompt-lookup speculation exists for (RAG answers quote
  retrieved context; llama.cpp's prompt-lookup reports 2-3× there).
  `tests/test_scheduler.py::test_speculative_speedup_on_copy_model`
  uses it to assert real acceptance through the batched scheduler.

TPU notes: batches stay device-resident across ``steps_per_launch``
scan steps (one launch per segment — the cached-pool trainer pattern,
ocr/train.py), params in f32 with bf16 activations per config.dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .decoder import DecoderConfig, DecoderLM, init_cache, init_decoder_params


def copy_task_batch(
    rng: np.random.Generator,
    batch: int,
    seq: int,
    vocab: int,
    *,
    sep_id: int = 3,
    lo: int = 4,
) -> np.ndarray:
    """[B, S] sequences ``prefix ++ SEP ++ prefix ++ prefix ...``: the
    model must learn to copy (induction) — after SEP every token is a
    deterministic function of the prefix."""
    p_len = max(4, seq // 4)
    out = np.zeros((batch, seq), np.int32)
    for b in range(batch):
        prefix = rng.integers(lo, vocab, size=p_len)
        row = list(prefix) + [sep_id]
        while len(row) < seq:
            row.extend(prefix)
        out[b] = row[:seq]
    return out


def make_train_step(config: DecoderConfig, optimizer):
    """Jitted (params, opt_state, batch [B, S]) → (params, opt_state,
    loss). Next-token CE over all positions."""
    model = DecoderLM(config)

    def loss_fn(params, batch):
        b, s = batch.shape
        cache = init_cache(config, b)
        positions = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)
        logits, _ = model.apply(
            params, batch, positions, cache, jnp.ones((b, s), bool)
        )
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = batch[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train_lm(
    config: DecoderConfig,
    batches,  # iterable of [B, S] int32 arrays
    *,
    lr: float = 3e-3,
    seed: int = 0,
    init_params=None,
):
    """Train over ``batches``; returns (params, losses)."""
    params = init_params or init_decoder_params(config, seed=seed)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = make_train_step(config, optimizer)
    losses = []
    for batch in batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch))
        losses.append(float(loss))
    return params, losses


def train_copy_lm(
    config: DecoderConfig,
    *,
    steps: int = 800,
    batch: int = 32,
    seq: int = 48,
    lr: float = 3e-3,
    seed: int = 0,
):
    """Train ``config`` on the copy task; returns (params, losses)."""
    rng = np.random.default_rng(seed)

    def gen():
        for _ in range(steps):
            yield copy_task_batch(rng, batch, seq, config.vocab_size)

    return train_lm(config, gen(), lr=lr, seed=seed)
