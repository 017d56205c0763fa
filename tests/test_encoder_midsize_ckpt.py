"""The SHIPPED mid-size encoder checkpoint serves and holds its bars.

Round-5: `scripts/train_encoder_midsize.py` trained a 6L/384h encoder
on TPU (4,000 cached-pool steps, 165 s) and committed the float16
checkpoint. This test proves the committed ARTIFACT — not a freshly
trained model — loads through the real provider path
(EMBEDDING_PROVIDER=tpu + EMBEDDING_CHECKPOINT) and clears the
graded-family bars the 2L/64h stand-in could not reach (graded dense
recall 0.727 / NDCG 0.567 — BENCH_NOTES round 5 quality matrix; the
mid checkpoint measured 1.000 / 0.917).

Reference parity: rag/providers/hf/embeddings.py:24 — the reference's
entire semantic quality comes from a downloaded checkpoint; this is
the in-environment equivalent, self-trained and version-controlled.
"""

from pathlib import Path

import numpy as np
import pytest

from intool_rag_tpu import config as config_mod
from intool_rag_tpu.eval.harness import build_engine_from_texts, evaluate_engine
from intool_rag_tpu.eval.synthetic import make_relevance_task_graded

CKPT = (
    Path(__file__).resolve().parent.parent
    / "intool_rag_tpu" / "models" / "weights" / "encoder_mid.npz"
)


@pytest.mark.slow
def test_shipped_midsize_checkpoint_serves_and_clears_graded_bars(monkeypatch):
    assert CKPT.exists(), "committed checkpoint missing"
    monkeypatch.setenv("EMBEDDING_CHECKPOINT", str(CKPT))
    monkeypatch.setenv("EMBEDDING_PROVIDER", "tpu")
    monkeypatch.setenv("EMBEDDING_QUERY_INSTRUCTION", "")
    config_mod.reset_config()
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider(model_name="self-trained-mid")
    assert provider.dimension == 384  # checkpoint dictates dims

    # seed-0 graded task: corpus-level split — the checkpoint trained on
    # seeds 1001-1004 only (scripts/train_encoder_midsize.py)
    task = make_relevance_task_graded(np.random.default_rng(0))
    eng = build_engine_from_texts(task.texts, provider)
    m = evaluate_engine(eng, provider, task.examples, k=10, modes=("dense",))[
        "dense"
    ]
    # measured 1.000 / 0.926 / 0.917 — generous margin for rng drift
    assert m["recall@k"] >= 0.90, m
    assert m["mrr"] >= 0.80, m
    assert m["ndcg@k"] >= 0.80, m
    config_mod.reset_config()


@pytest.mark.slow
def test_hard_graded_tier_is_rankable(monkeypatch):
    """The default graded draw re-saturated at recall@10=1.000 for the
    mid checkpoint; this HARDER draw (4x corpus via n_ctx=64 x
    docs_per_ctx=32, decoy_prob=0.8 — parameters only, no new
    generator) keeps quality work rankable while hash collapses
    (0.012 recall). The shipped v2 checkpoint (trained with hard-draw
    seeds 2001-2004, ENC_MID_V2=1) measured 0.953 recall / 0.786 NDCG
    here vs v1's 0.665 / 0.473 — the gain the tier exists to measure.
    Rankability bar is on NDCG (recall saturates first)."""
    monkeypatch.setenv("EMBEDDING_CHECKPOINT", str(CKPT))
    monkeypatch.setenv("EMBEDDING_PROVIDER", "tpu")
    monkeypatch.setenv("EMBEDDING_QUERY_INSTRUCTION", "")
    config_mod.reset_config()
    from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider(model_name="self-trained-mid")
    task = make_relevance_task_graded(
        np.random.default_rng(0), n_ctx=64, docs_per_ctx=32,
        decoy_prob=0.8, n_eval=96,
    )
    eng = build_engine_from_texts(task.texts, provider)
    m = evaluate_engine(eng, provider, task.examples, k=10, modes=("dense",))[
        "dense"
    ]
    hashp = HashEmbeddingProvider(384)
    eng_h = build_engine_from_texts(task.texts, hashp)
    mh = evaluate_engine(eng_h, hashp, task.examples, k=10, modes=("dense",))[
        "dense"
    ]
    assert 0.30 <= m["ndcg@k"] <= 0.95, m   # rankable: off both ceilings
    assert m["recall@k"] >= 0.85, m         # v2 floor (measured 0.953)
    assert m["recall@k"] >= mh["recall@k"] + 0.4, (m, mh)
    config_mod.reset_config()
