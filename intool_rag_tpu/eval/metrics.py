"""Ranking metrics: Recall@K, MRR, NDCG@K."""

from __future__ import annotations

import math
from typing import Sequence


def recall_at_k(ranked: Sequence, relevant: set, k: int) -> float:
    """|top-k ∩ relevant| / |relevant|."""
    if not relevant:
        return 0.0
    return len(set(ranked[:k]) & relevant) / len(relevant)


def mrr(ranked: Sequence, relevant: set) -> float:
    """Reciprocal rank of the first relevant item (0 if none)."""
    for i, item in enumerate(ranked):
        if item in relevant:
            return 1.0 / (i + 1)
    return 0.0


def ndcg_at_k(ranked: Sequence, relevant: set, k: int) -> float:
    """Binary-gain NDCG@K."""
    dcg = sum(
        1.0 / math.log2(i + 2) for i, item in enumerate(ranked[:k]) if item in relevant
    )
    ideal = sum(1.0 / math.log2(i + 2) for i in range(min(len(relevant), k)))
    return dcg / ideal if ideal else 0.0
