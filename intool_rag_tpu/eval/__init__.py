"""Retrieval quality evaluation: metrics + harness (the reference has no
evaluation at all; BASELINE.md's recall-parity targets require one)."""

from .metrics import mrr, ndcg_at_k, recall_at_k  # noqa: F401
from .harness import EvalExample, evaluate_engine  # noqa: F401
