"""Hybrid fusion: weighted score combination and reciprocal-rank fusion.

Implements the capability the reference declares but never built
(rag/config.py:43-45: BM25_WEIGHT 0.3 / VECTOR_WEIGHT 0.7, hybrid
enabled; README.md:54-58). Both fusion modes operate on candidate sets
(top-K per retriever) with static shapes so they jit cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def weighted_fusion(
    dense_idx: jax.Array,  # [Q, Kd] i32
    dense_scores: jax.Array,  # [Q, Kd] f32, already in [0, 1]
    sparse_idx: jax.Array,  # [Q, Ks] i32
    sparse_scores: jax.Array,  # [Q, Ks] f32, already in [0, 1]
    k: int,
    *,
    w_dense: float = 0.7,
    w_sparse: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Weighted-sum fusion over the union of two candidate lists.

    A candidate appearing in only one list contributes 0 from the other
    (its score there is below that list's cut — treating it as 0 is the
    standard convex-combination convention). Returns top-k
    ``(scores [Q,k], indices [Q,k])`` by fused score.
    """
    ids = jnp.concatenate([dense_idx, sparse_idx], axis=1)  # [Q, Kd+Ks]
    d_part = jnp.concatenate(
        [dense_scores, jnp.zeros_like(sparse_scores)], axis=1
    )
    s_part = jnp.concatenate(
        [jnp.zeros_like(dense_scores), sparse_scores], axis=1
    )
    # Cross-fill: where the same id appears in both lists, each occurrence
    # must carry both contributions; then dedup keeps the best occurrence.
    eq = ids[:, :, None] == ids[:, None, :]  # [Q, K, K]
    d_full = jnp.max(jnp.where(eq, d_part[:, None, :], 0.0), axis=2)
    s_full = jnp.max(jnp.where(eq, s_part[:, None, :], 0.0), axis=2)
    fused = w_dense * d_full + w_sparse * s_full
    fused = _dedup_mask(ids, fused)
    k = min(k, ids.shape[1])
    vals, pos = jax.lax.top_k(fused, k)
    return vals, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fusion(
    dense_idx: jax.Array,  # [Q, Kd] i32, rank order
    sparse_idx: jax.Array,  # [Q, Ks] i32, rank order
    k: int,
    *,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """Reciprocal-rank fusion: score(c) = Σ_lists 1/(rrf_k + rank(c)).

    Ranks are 1-based positions in each list; absent → no contribution.
    Returns top-k ``(fused_scores [Q,k], indices [Q,k])``.
    """
    q, kd = dense_idx.shape
    ks = sparse_idx.shape[1]
    ids = jnp.concatenate([dense_idx, sparse_idx], axis=1)
    rank_d = 1.0 / (rrf_k + 1.0 + jnp.arange(kd, dtype=jnp.float32))
    rank_s = 1.0 / (rrf_k + 1.0 + jnp.arange(ks, dtype=jnp.float32))
    contrib = jnp.concatenate(
        [jnp.tile(rank_d, (q, 1)), jnp.tile(rank_s, (q, 1))], axis=1
    )
    eq = ids[:, :, None] == ids[:, None, :]
    fused = jnp.sum(jnp.where(eq, contrib[:, None, :], 0.0), axis=2)
    fused = _dedup_mask(ids, fused)
    k = min(k, ids.shape[1])
    vals, pos = jax.lax.top_k(fused, k)
    return vals, jnp.take_along_axis(ids, pos, axis=1)


def _dedup_mask(ids: jax.Array, scores: jax.Array) -> jax.Array:
    """Keep only the first occurrence of each id (later duplicates → -inf);
    invalid ids (< 0) also masked."""
    eq = ids[:, :, None] == ids[:, None, :]  # [Q, K, K]
    pos = jnp.arange(ids.shape[1])
    earlier = eq & (pos[None, None, :] < pos[None, :, None])
    is_dup = jnp.any(earlier, axis=2)
    return jnp.where(is_dup | (ids < 0), -jnp.inf, scores)


def normalize_minmax(scores: jax.Array, axis: int = -1) -> jax.Array:
    """Min-max normalize candidate scores into [0, 1] per query."""
    lo = jnp.min(scores, axis=axis, keepdims=True)
    hi = jnp.max(scores, axis=axis, keepdims=True)
    return (scores - lo) / jnp.maximum(hi - lo, 1e-9)
