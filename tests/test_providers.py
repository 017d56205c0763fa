"""Provider port tests: hash embedder, fake LLM, heuristic analyzer,
factories, JSON sanitizer."""

import numpy as np

from intool_rag_tpu.providers.fake import FakeLLM
from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider
from intool_rag_tpu.providers.heuristic_semantic import HeuristicSemanticAnalyzer
from intool_rag_tpu.providers.json_utils import sanitize_json


def test_hash_embedder_similarity():
    p = HashEmbeddingProvider(dimension=256)
    vecs = p.embed_batch(
        ["the fox jumped", "a fox that jumped high", "quarterly revenue report"]
    )
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-5)
    sim_related = vecs[0] @ vecs[1]
    sim_unrelated = vecs[0] @ vecs[2]
    assert sim_related > sim_unrelated + 0.2


def test_hash_embedder_deterministic():
    a = HashEmbeddingProvider(64).embed_single("stable text")
    b = HashEmbeddingProvider(64).embed_single("stable text")
    np.testing.assert_array_equal(a, b)


def test_hash_embedder_empty_text():
    v = HashEmbeddingProvider(64).embed_single("")
    assert np.isclose(np.linalg.norm(v), 1.0)


def test_fake_llm_extractive():
    llm = FakeLLM()
    prompt = (
        "Context:\n"
        "The warranty period is 24 months. Returns are accepted within 30 days. "
        "Shipping is free for orders over 50 dollars.\n\n"
        "Question: How long is the warranty period?\n\nAnswer:"
    )
    answer = llm.generate(prompt)
    assert "24 months" in answer
    assert llm.is_ready()


def test_fake_llm_no_match():
    llm = FakeLLM()
    out = llm.generate("Context:\nalpha beta.\n\nQuestion: zzz qqq?\n\nAnswer:")
    assert "could not find" in out


def test_heuristic_analyzer_detects_headings():
    pages = [
        "1. Introduction\nThis document describes the system in detail.\n"
        "1.1 Scope\nThe scope covers ingestion and querying.",
        "2. Architecture\nThe architecture has several layers.",
    ]
    sections = HeuristicSemanticAnalyzer().analyze(pages)
    titles = [s.title for s in sections]
    assert "1. Introduction" in titles
    assert "2. Architecture" in titles
    by_title = {s.title: s for s in sections}
    assert by_title["1. Introduction"].level == "chapter"
    assert by_title["1.1 Scope"].level == "section"
    assert by_title["2. Architecture"].page_index == 1


def test_heuristic_analyzer_fallback_section():
    sections = HeuristicSemanticAnalyzer().analyze(["just some plain prose text."])
    assert len(sections) == 1
    assert sections[0].page_index == 0


def test_sanitize_json_fenced():
    assert sanitize_json('```json\n{"a": 1}\n```') == {"a": 1}


def test_sanitize_json_embedded():
    assert sanitize_json('noise before {"sections": [1, 2]} noise after') == {
        "sections": [1, 2]
    }


def test_factories_offline(tmp_storage, monkeypatch):
    """With no network and no key, factories land on offline providers."""
    monkeypatch.setenv("EMBEDDING_PROVIDER", "hash")
    monkeypatch.setenv("LLM_PROVIDER", "fake")
    monkeypatch.setenv("GEMINI_API_KEY", "")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.llm.embeddings.factory import (
        get_embedding_provider,
        reset_embedding_provider,
    )
    from intool_rag_tpu.llm.factory import get_llm, reset_llm
    from intool_rag_tpu.llm.semantic.factory import (
        get_semantic_analyzer,
        reset_semantic_analyzer,
    )

    reset_embedding_provider()
    reset_llm()
    reset_semantic_analyzer()
    assert get_embedding_provider().model_name.startswith("hash")
    assert get_llm().get_info()["provider"] == "fake"
    assert type(get_semantic_analyzer()).__name__ == "HeuristicSemanticAnalyzer"
    reset_embedding_provider()
    reset_llm()
    reset_semantic_analyzer()


def test_tpu_embed_packed_matches_padded(tmp_storage, monkeypatch):
    """EMBED_PACKED=1 (ragged packed encode, models/packing.py) must
    produce the same embeddings as the padded path: identical per-text
    computation, different layout. f32 on CPU -> tight tolerance."""
    import numpy as np

    monkeypatch.setenv("EMBEDDING_PRESET", "tiny")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider()
    rng = np.random.default_rng(0)
    words = ["invoice", "total", "amount", "shipping", "terms", "due"]
    texts = [
        " ".join(rng.choice(words, int(rng.integers(2, 40))))
        for _ in range(13)
    ]
    base = provider.embed_batch(texts)
    provider.packed = True
    packed = provider.embed_batch(texts)
    assert packed.shape == base.shape
    np.testing.assert_allclose(packed, base, rtol=2e-4, atol=2e-4)
    # queries go through the same path with the instruction prefix
    bq = provider.embed_batch(texts[:3], is_query=True)
    pq = provider.embed_batch(texts[:3], is_query=True)
    np.testing.assert_allclose(pq, bq, rtol=2e-4, atol=2e-4)


def test_embed_batch_device_matches_host_path(monkeypatch, tmp_storage):
    """embed_batch_device (round 5: the retriever's zero-round-trip
    path) must produce the same vectors as embed_batch, with bucket
    padding beyond len(texts)."""
    import numpy as np

    from intool_rag_tpu import config as config_mod

    monkeypatch.setenv("EMBEDDING_PROVIDER", "tpu")
    config_mod.reset_config()
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    p = TPUEmbeddingProvider(model_name="tiny-test")
    texts = ["alpha beta gamma", "delta", "epsilon zeta eta theta"]
    host = p.embed_batch(texts, is_query=True)
    dev = p.embed_batch_device(texts, is_query=True)
    assert dev is not None
    np.testing.assert_allclose(
        np.asarray(dev)[: len(texts)], host, rtol=1e-5, atol=1e-6
    )
    assert p.embed_batch_device([]) is None
    config_mod.reset_config()
