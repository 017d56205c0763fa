"""Cross-encoder reranker tests: torch head parity + rerank plumbing."""

import numpy as np
import pytest

from intool_rag_tpu.models.encoder import EncoderConfig
from intool_rag_tpu.models.reranker import (
    CrossEncoder,
    Reranker,
    load_reranker_torch_state_dict,
)


def test_reranker_scores_and_shapes():
    r = Reranker.create()
    scores = r.score_pairs(["query one", "query two"], ["passage a", "passage b"])
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


def test_rerank_orders_and_truncates():
    r = Reranker.create()
    cands = [{"text": f"candidate {i}", "chunk_id": i} for i in range(6)]
    out = r.rerank("some query", cands, top_k=3)
    assert len(out) == 3
    scores = [h["rerank_score"] for h in out]
    assert scores == sorted(scores, reverse=True)
    assert [h["rerank_position"] for h in out] == [0, 1, 2]
    assert r.rerank("q", [], top_k=3) == []


def test_rerank_deterministic():
    r = Reranker.create(seed=7)
    cands = [{"text": t} for t in ("alpha", "beta", "gamma")]
    a = [h["rerank_score"] for h in r.rerank("q", cands, top_k=3)]
    b = [h["rerank_score"] for h in r.rerank("q", cands, top_k=3)]
    assert a == b


def test_reranker_factory_disabled(tmp_storage, monkeypatch):
    monkeypatch.setenv("RERANKER_ENABLED", "false")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.llm.reranker_factory import get_reranker, reset_reranker

    reset_reranker()
    assert get_reranker() is None
    reset_reranker()


def test_reranker_factory_no_weights_degrades(tmp_storage, monkeypatch):
    monkeypatch.setenv("RERANKER_ENABLED", "true")
    monkeypatch.setenv("RERANKER_MODEL", "no/such-model")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.llm.reranker_factory import get_reranker, reset_reranker

    reset_reranker()
    assert get_reranker() is None  # enabled but weightless -> disabled
    reset_reranker()


@pytest.mark.slow
def test_reranker_factory_loads_local_weights(tmp_path, tmp_storage, monkeypatch):
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaForSequenceClassification

    hf_cfg = XLMRobertaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=1, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    model_dir = tmp_path / "tiny-reranker"
    XLMRobertaForSequenceClassification(hf_cfg).save_pretrained(model_dir)
    monkeypatch.setenv("RERANKER_ENABLED", "true")
    monkeypatch.setenv("RERANKER_MODEL", str(model_dir))
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.llm.reranker_factory import get_reranker, reset_reranker

    reset_reranker()
    reranker = get_reranker()
    assert reranker is not None
    scores = reranker.score_pairs(["q"], ["passage"])
    assert scores.shape == (1,) and np.isfinite(scores).all()
    reset_reranker()


@pytest.mark.slow
def test_cross_encoder_matches_torch():
    torch = pytest.importorskip("torch")
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
    )

    hf_cfg = XLMRobertaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=66,
        type_vocab_size=1,
        pad_token_id=1,
        num_labels=1,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(0)
    model = XLMRobertaForSequenceClassification(hf_cfg).eval()

    cfg = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=66, dtype="float32",
    )
    params = load_reranker_torch_state_dict(cfg, model.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, size=(3, 12)).astype(np.int32)
    ids[:, 0] = 0
    mask = np.ones((3, 12), np.int32)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits[:, 0].numpy()
    import jax

    got = np.asarray(jax.jit(CrossEncoder(cfg).apply)(params, ids, mask))
    np.testing.assert_allclose(got, want, atol=3e-5)
