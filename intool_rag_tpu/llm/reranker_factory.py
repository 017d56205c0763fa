"""Reranker factory: builds the cross-encoder when enabled and weights
are available (reference declares RERANKER_MODEL/RERANKER_ENABLED —
rag/config.py:24-27 — with no implementation behind them)."""

from __future__ import annotations

import threading

from ..config import get_config
from ..logging import get_logger

logger = get_logger(__name__)

_reranker = None
_built = False
_lock = threading.Lock()


def _build():
    cfg = get_config()
    if not cfg.RERANKER_ENABLED:
        return None
    from ..models.encoder import EncoderConfig
    from ..models.reranker import Reranker, load_reranker_torch_state_dict

    try:
        from transformers import AutoConfig, AutoModelForSequenceClassification

        hf_config = AutoConfig.from_pretrained(cfg.RERANKER_MODEL, local_files_only=True)
        model = AutoModelForSequenceClassification.from_pretrained(
            cfg.RERANKER_MODEL, local_files_only=True
        )
        enc_config = EncoderConfig(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position=hf_config.max_position_embeddings,
            pad_token_id=hf_config.pad_token_id or 1,
        )
        params = load_reranker_torch_state_dict(enc_config, model.state_dict())
        logger.info("reranker loaded from %s", cfg.RERANKER_MODEL)
        return Reranker.create(enc_config, params=params)
    except Exception as exc:
        logger.warning(
            "RERANKER_ENABLED but no local weights for %s (%s) — reranking "
            "disabled (random weights would hurt ranking quality)",
            cfg.RERANKER_MODEL, exc,
        )
        return None


def get_reranker():
    """Returns the process reranker or None (disabled / no weights)."""
    global _reranker, _built
    if not _built:
        with _lock:
            if not _built:
                _reranker = _build()
                _built = True
    return _reranker


def reset_reranker() -> None:
    global _reranker, _built
    _reranker = None
    _built = False
