"""Exact blockwise dense search: tiled score matmul + streaming top-k.

TPU-native replacement for FAISS ``IndexFlatL2.search`` (reference:
rag/storage/faiss_index.py:63-91,106-128). The corpus matrix ``[N, D]``
is scanned in blocks: each block's scores come from one MXU matmul and are
immediately reduced to the block's top-k, which merges into a running
top-k — the full ``[Q, N]`` score matrix is never materialized, so memory
traffic is one corpus read per query batch (HBM-bandwidth bound, per
BASELINE.json's north star).

Metrics:
- ``ip``      — inner product (MIPS).
- ``cosine``  — inner product over pre-normalized vectors, mapped to the
  reference's score space ``1 - d/2`` which equals cosine similarity for
  unit vectors (reference maps L2 distance d to score ``1 - d/2`` at
  faiss_index.py:87; for unit vectors d = 2 - 2·ip so the two agree).
- ``l2``      — ranking by negative squared L2 distance using the
  ``|e|² - 2·q·e`` expansion (query norm is rank-invariant).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Metric = Literal["ip", "cosine", "l2"]


def _precision_for(dtype) -> jax.lax.Precision:
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def merge_topk(
    values_a: jax.Array,
    indices_a: jax.Array,
    values_b: jax.Array,
    indices_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two (values, indices) top-k sets along the last axis."""
    values = jnp.concatenate([values_a, values_b], axis=-1)
    indices = jnp.concatenate([indices_a, indices_b], axis=-1)
    top_vals, top_pos = jax.lax.top_k(values, k)
    return top_vals, jnp.take_along_axis(indices, top_pos, axis=-1)


def _block_scores(
    queries: jax.Array,
    block: jax.Array,
    block_norms_sq: jax.Array | None,
    metric: Metric,
) -> jax.Array:
    scores = jax.lax.dot_general(
        queries,
        block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 inputs must not silently use bf16 multiplies (JAX's default
        # matmul precision); for bf16 corpora DEFAULT avoids a multi-pass
        # promotion on the MXU.
        precision=_precision_for(queries.dtype),
    )
    if metric == "l2":
        assert block_norms_sq is not None
        scores = 2.0 * scores - block_norms_sq[None, :]
    return scores


def _block_topk(scores: jax.Array, k: int, use_approx: bool) -> tuple[jax.Array, jax.Array]:
    if use_approx:
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "block_n", "use_approx")
)
def flat_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    metric: Metric = "cosine",
    block_n: int = 16384,
    use_approx: bool = False,
    valid_n: int | jax.Array | None = None,
    corpus_norms_sq: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k search of ``queries [Q, D]`` against ``corpus [N, D]``.

    Returns ``(scores [Q, k] f32, indices [Q, k] i32)`` sorted descending.
    ``valid_n`` masks out padding rows at the tail of the corpus; it is a
    *traced* value (int or scalar array), so corpora of the same padded
    shape share one compilation across appends, and shard_map callers can
    pass a per-shard count (parallel/sharded_search.py).
    ``use_approx`` selects ``lax.approx_max_k`` for the per-block reduction
    (TPU-native partial-reduce; CPU falls back to exact sort).
    """
    n, d = corpus.shape
    q = queries.shape[0]
    if valid_n is None:
        valid_n = n
    k = min(k, n)
    if metric == "l2" and corpus_norms_sq is None:
        corpus_norms_sq = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=1
        )

    block_n = min(block_n, n)
    num_blocks = -(-n // block_n)
    padded_n = num_blocks * block_n
    if padded_n != n:
        corpus = jnp.pad(corpus, ((0, padded_n - n), (0, 0)))
        if corpus_norms_sq is not None:
            corpus_norms_sq = jnp.pad(corpus_norms_sq, (0, padded_n - n))

    queries = queries.astype(corpus.dtype)

    def body(carry, block_idx):
        best_vals, best_idx = carry
        start = block_idx * block_n
        block = jax.lax.dynamic_slice(corpus, (start, 0), (block_n, d))
        bnorms = (
            jax.lax.dynamic_slice(corpus_norms_sq, (start,), (block_n,))
            if metric == "l2"
            else None
        )
        scores = _block_scores(queries, block, bnorms, metric)
        local_ids = start + jax.lax.broadcasted_iota(jnp.int32, (q, block_n), 1)
        scores = jnp.where(local_ids < valid_n, scores, -jnp.inf)
        block_vals, block_pos = _block_topk(scores, min(k, block_n), use_approx)
        block_idx_global = jnp.take_along_axis(local_ids, block_pos, axis=-1)
        best_vals, best_idx = merge_topk(
            best_vals, best_idx, block_vals, block_idx_global, k
        )
        return (best_vals, best_idx), None

    init = (
        jnp.full((q, k), -jnp.inf, dtype=jnp.float32),
        jnp.full((q, k), -1, dtype=jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))

    if metric == "cosine":
        # Reference score space: clamp cosine similarity into [0, 1]
        # (faiss_index.py:87 clamps 1 - d/2 into [0, 1]) — but keep the
        # -inf of masked padding rows so they can never outrank real rows.
        vals = jnp.where(jnp.isfinite(vals), jnp.clip(vals, 0.0, 1.0), vals)
    return vals, idx


def rescore_candidates(
    queries: jax.Array,  # [Q, D] f32
    corpus: jax.Array,  # [N, D] any dtype
    rows: jax.Array,  # [Q, K] i32 candidate rows (-1 allowed)
    *,
    metric: Metric = "cosine",
) -> jax.Array:
    """Exact f32 rescoring of a small candidate set: gather the candidate
    embeddings and recompute scores at full precision. Removes bf16/
    approx-selection score noise from the final ranking at negligible
    cost (K rows per query). Returns [Q, K] f32 with -inf at rows < 0."""
    safe = jnp.maximum(rows, 0)
    cand = corpus[safe].astype(jnp.float32)  # [Q, K, D]
    scores = jnp.einsum(
        "qd,qkd->qk", queries.astype(jnp.float32), cand,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        # Same monotonic l2 score space as flat_topk/exact_scores
        # (2·ip − |e|²); a raw inner product would re-rank an l2 index
        # by the wrong ordering (ADVICE.md round 1).
        norms = jnp.sum(cand * cand, axis=-1)  # [Q, K]
        scores = 2.0 * scores - norms
    elif metric == "cosine":
        scores = jnp.clip(scores, 0.0, 1.0)
    return jnp.where(rows >= 0, scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def blocked_topk(
    scores: jax.Array, k: int, *, block: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis via two-stage blocked selection.

    Stage 1 takes top-k within each ``block``-wide slice, stage 2 a final
    top-k over the survivors. This is EXACT for any distribution: a block
    can contain at most k of the global top-k, and stage 1 keeps k per
    block. Much cheaper than one monolithic sort (bitonic cost grows with
    log² of the sort width) — ~3× faster than ``lax.top_k`` on [256, 64k]
    and far faster to compile.
    """
    q, m = scores.shape
    k = min(k, m)
    if m <= block or m <= 2 * k:
        return jax.lax.top_k(scores, k)
    num_blocks = -(-m // block)
    padded = num_blocks * block
    if padded != m:
        scores = jnp.pad(scores, ((0, 0), (0, padded - m)), constant_values=-jnp.inf)
    blocked = scores.reshape(q, num_blocks, block)
    kb = min(k, block)
    b_vals, b_pos = jax.lax.top_k(blocked, kb)  # [Q, B, kb]
    base = (jnp.arange(num_blocks) * block)[None, :, None]
    b_idx = (b_pos + base).reshape(q, num_blocks * kb)
    b_vals = b_vals.reshape(q, num_blocks * kb)
    vals, pos = jax.lax.top_k(b_vals, k)
    return vals, jnp.take_along_axis(b_idx, pos, axis=1)


def exact_scores(
    queries: jax.Array, corpus: jax.Array, metric: Metric = "cosine"
) -> jax.Array:
    """Full [Q, N] scores — small corpora and tests only."""
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype),
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(corpus.dtype),
    )
    if metric == "l2":
        norms = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
        scores = 2.0 * scores - norms[None, :]
    elif metric == "cosine":
        scores = jnp.clip(scores, 0.0, 1.0)
    return scores
