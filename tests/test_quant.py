"""Int8 quantization + quantized search tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.ops.quant import (
    dequantize_int8,
    flat_topk_int8,
    quantize_int8,
    quantize_int8_stochastic,
)


def _normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_quantize_roundtrip_error(rng):
    x = rng.standard_normal((50, 64)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(x))
    assert q.dtype == jnp.int8
    back = np.asarray(dequantize_int8(q, s))
    err = np.abs(back - x).max() / np.abs(x).max()
    assert err < 0.01  # 1/127 half-step


def test_quantize_stochastic_unbiased(rng):
    x = jnp.full((8, 128), 0.3, jnp.float32)
    acc = np.zeros((8, 128), np.float64)
    for seed in range(32):
        q, s = quantize_int8_stochastic(x, seed=seed, interpret=True)
        acc += np.asarray(dequantize_int8(q, s))
    mean = acc / 32
    # round-to-nearest would be deterministic; stochastic mean approaches x
    assert abs(mean.mean() - 0.3) < 0.005


def test_flat_topk_int8_recall(rng):
    corpus = _normed(rng, (2000, 128))
    queries = _normed(rng, (16, 128))
    cq, cs = quantize_int8(jnp.asarray(corpus))
    vals, rows = flat_topk_int8(jnp.asarray(queries), cq, cs, 10, block_n=512)
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    got = np.asarray(rows)
    hits = sum(len(set(a) & set(b)) for a, b in zip(got.tolist(), oracle.tolist()))
    assert hits / oracle.size >= 0.95
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_flat_topk_int8_valid_n(rng):
    corpus = _normed(rng, (100, 32))
    corpus[90:] = 1.0
    cq, cs = quantize_int8(jnp.asarray(corpus))
    _, rows = flat_topk_int8(jnp.asarray(corpus[:2]), cq, cs, 5, block_n=64, valid_n=90)
    assert np.asarray(rows).max() < 90
