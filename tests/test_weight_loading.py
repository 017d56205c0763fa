"""Provider weight-loading tests: HF local weights → TPU provider, and
the Ollama embedding REST client against a stub server."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


@pytest.mark.slow
def test_tpu_provider_loads_local_hf_weights(tmp_path, tmp_storage, monkeypatch):
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    model_dir = tmp_path / "tiny-model"
    model.save_pretrained(model_dir)

    monkeypatch.setenv("EMBEDDING_MODEL", str(model_dir))
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider()
    # config was adopted from the HF checkpoint
    assert provider.encoder_config.hidden_size == 32
    assert provider.dimension == 32
    # weights actually loaded: compare against torch on the same token ids
    ids, mask = provider.tokenizer.encode_batch(["hello world"])
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state[:, 0, :].numpy()
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    got = provider.embed_batch(["hello world"])
    np.testing.assert_allclose(got, want, atol=3e-5)


class _StubOllama(BaseHTTPRequestHandler):
    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length))
        n = len(body["input"])
        vecs = [[float(len(t)), 1.0, 0.0, 0.0] for t in body["input"]]
        data = json.dumps({"embeddings": vecs}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


def test_ollama_embedding_provider(tmp_storage, monkeypatch):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubOllama)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv("LLM_BASE_URL", f"http://127.0.0.1:{server.server_address[1]}")
        monkeypatch.setenv("EMBEDDING_PASSAGE_INSTRUCTION", "")
        from intool_rag_tpu import config as config_mod

        config_mod.reset_config()
        from intool_rag_tpu.providers.ollama_embed import OllamaEmbeddingProvider

        p = OllamaEmbeddingProvider(model="test-model")
        vecs = p.embed_batch(["abc", "longer text"])
        assert vecs.shape == (2, 4)
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-6)
        assert p.dimension == 4
        # longer text -> larger first component before normalization
        assert vecs[1, 0] > vecs[0, 0] * 0.9
    finally:
        server.shutdown()


def test_embedding_factory_ollama_choice(tmp_storage, monkeypatch):
    monkeypatch.setenv("EMBEDDING_PROVIDER", "ollama")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.llm.embeddings.factory import (
        reset_embedding_provider,
        get_embedding_provider,
    )

    reset_embedding_provider()
    p = get_embedding_provider()
    assert type(p).__name__ == "OllamaEmbeddingProvider"
    reset_embedding_provider()
