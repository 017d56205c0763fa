"""Hybrid fusion: weighted score combination and reciprocal-rank fusion.

Implements the capability the reference declares but never built
(rag/config.py:43-45: BM25_WEIGHT 0.3 / VECTOR_WEIGHT 0.7, hybrid
enabled; README.md:54-58). Both fusion modes operate on candidate sets
(top-K per retriever) with static shapes so they jit cleanly.

The id join is sort-based: candidates sort by id, equal ids become
adjacent, and each candidate's contributions combine across its (at most
two — one per retriever) occurrences by looking one slot left/right.
O(K log K) per query vs the O(K²) equality-matrix join, which capped the
practical rerank pool size (round-1 verdict)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max


def _sorted_join(ids: jax.Array, parts: list[jax.Array]):
    """Sort candidates by id (invalid ids < 0 → sentinel, sorts last).

    Returns (sorted_ids, sorted_parts, same_prev, same_next) where
    same_prev/next flag adjacent equal ids. Each id appears at most once
    per retriever list (top-k indices are unique), so a candidate has at
    most 2 occurrences and neighbor-combining is an exact join.
    """
    clean = jnp.where(ids < 0, _SENTINEL, ids)
    order = jnp.argsort(clean, axis=1)
    sid = jnp.take_along_axis(clean, order, axis=1)
    sparts = [jnp.take_along_axis(p, order, axis=1) for p in parts]
    zeros = jnp.zeros_like(sid[:, :1], bool)
    same_prev = jnp.concatenate([zeros, sid[:, 1:] == sid[:, :-1]], axis=1)
    same_next = jnp.concatenate([sid[:, :-1] == sid[:, 1:], zeros], axis=1)
    return sid, sparts, same_prev, same_next


def _combine_neighbors(x: jax.Array, same_prev: jax.Array, same_next: jax.Array):
    """x[i] + x[i-1]·same_prev + x[i+1]·same_next (exact pairwise join)."""
    left = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    return x + jnp.where(same_prev, left, 0.0) + jnp.where(same_next, right, 0.0)


def _select_topk(sid, fused, same_prev, k):
    """Mask duplicates/sentinels, take top-k, map sentinel ids to -1."""
    valid = (sid != _SENTINEL) & ~same_prev
    fused = jnp.where(valid, fused, -jnp.inf)
    k = min(k, sid.shape[1])
    vals, pos = jax.lax.top_k(fused, k)
    out_ids = jnp.take_along_axis(sid, pos, axis=1)
    out_ids = jnp.where(jnp.isfinite(vals), out_ids, -1)
    return vals, out_ids


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
    sid, (d_s, s_s), same_prev, same_next = _sorted_join(ids, [d_part, s_part])
    # each part is zero in the other list's slot, so neighbor-sum == join
    d_full = _combine_neighbors(d_s, same_prev, same_next)
    s_full = _combine_neighbors(s_s, same_prev, same_next)
    fused = w_dense * d_full + w_sparse * s_full
    return _select_topk(sid, fused, same_prev, k)


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
    sid, (c_s,), same_prev, same_next = _sorted_join(ids, [contrib])
    fused = _combine_neighbors(c_s, same_prev, same_next)
    return _select_topk(sid, fused, same_prev, k)


def normalize_minmax(scores: jax.Array, axis: int = -1) -> jax.Array:
    """Min-max normalize candidate scores into [0, 1] per query."""
    lo = jnp.min(scores, axis=axis, keepdims=True)
    hi = jnp.max(scores, axis=axis, keepdims=True)
    return (scores - lo) / jnp.maximum(hi - lo, 1e-9)
