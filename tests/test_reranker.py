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


def test_packed_scores_match_bucketed():
    """Packed (ragged, block-diagonal attention) scoring must equal the
    one-pair-per-row path: same positions, same attention pattern, same
    head — only the layout differs. f32 on CPU → tight tolerance."""
    r = Reranker.create(seed=3)
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    queries, passages = [], []
    for i in range(17):  # odd count: exercises partial bins + P padding
        nq = int(rng.integers(2, 6))
        np_ = int(rng.integers(4, 30))
        queries.append(" ".join(rng.choice(words, nq)))
        passages.append(" ".join(rng.choice(words, np_)))
    base = r.score_pairs(queries, passages, packed=False)
    packed = r.score_pairs(queries, passages, packed=True)
    np.testing.assert_allclose(packed, base, rtol=2e-4, atol=2e-4)
    assert r.last_padding_waste >= 0.0


def test_packed_single_long_pair_fits():
    r = Reranker.create(seed=3)
    long_passage = " ".join(["word"] * 120)
    base = r.score_pairs(["q"], [long_passage], packed=False)
    packed = r.score_pairs_packed(["q"], [long_passage], width=32)
    np.testing.assert_allclose(packed, base, rtol=2e-4, atol=2e-4)


def test_packed_env_default(monkeypatch):
    monkeypatch.setenv("RERANK_PACKED", "1")
    r = Reranker.create(seed=3)
    assert r.packed
    s = r.score_pairs(["a b c"], ["d e f g"])
    assert s.shape == (1,) and np.isfinite(s).all()
