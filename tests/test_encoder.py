"""Encoder architecture parity vs torch XLMRobertaModel (golden-vector
strategy from SURVEY.md §7.3 #5: with real BGE-M3 weights the same
mapping reproduces its embeddings)."""

import numpy as np
import pytest

from intool_rag_tpu.models.encoder import (
    EncoderConfig,
    encode_fn,
    init_params,
    load_torch_state_dict,
)
from intool_rag_tpu.models.tokenizer import SimpleTokenizer


def test_encoder_shapes_and_norm():
    cfg = EncoderConfig.tiny()
    params = init_params(cfg)
    fn = encode_fn(cfg)
    ids = np.array([[0, 5, 6, 2, 1, 1], [0, 7, 2, 1, 1, 1]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]], np.int32)
    out = np.asarray(fn(params, ids, mask))
    assert out.shape == (2, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_encoder_padding_invariance():
    """Extra padding must not change the embedding (mask correctness)."""
    cfg = EncoderConfig.tiny()
    params = init_params(cfg)
    fn = encode_fn(cfg)
    ids = np.array([[0, 5, 6, 2]], np.int32)
    mask = np.ones((1, 4), np.int32)
    out1 = np.asarray(fn(params, ids, mask))
    ids2 = np.pad(ids, ((0, 0), (0, 4)), constant_values=1)
    mask2 = np.pad(mask, ((0, 0), (0, 4)))
    out2 = np.asarray(fn(params, ids2, mask2))
    np.testing.assert_allclose(out1, out2, atol=2e-5)


@pytest.mark.slow
def test_encoder_matches_torch_xlmroberta():
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=66,
        type_vocab_size=1,
        pad_token_id=1,
        layer_norm_eps=1e-5,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = EncoderConfig(
        vocab_size=128,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position=66,
        type_vocab_size=1,
        pad_token_id=1,
        dtype="float32",
    )
    params = load_torch_state_dict(cfg, model.state_dict())
    fn = encode_fn(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, size=(3, 10)).astype(np.int32)
    ids[:, 0] = 0
    mask = np.ones((3, 10), np.int32)
    mask[1, 7:] = 0
    ids[1, 7:] = 1

    with torch.no_grad():
        torch_out = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state[:, 0, :].numpy()
    torch_cls = torch_out / np.linalg.norm(torch_out, axis=1, keepdims=True)

    jax_cls = np.asarray(fn(params, ids, mask))
    np.testing.assert_allclose(jax_cls, torch_cls, atol=2e-5)


def test_simple_tokenizer_deterministic():
    tok = SimpleTokenizer(vocab_size=512)
    ids1, m1 = tok.encode_batch(["hello world", "hello"])
    ids2, m2 = tok.encode_batch(["hello world", "hello"])
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1[0, 0] == tok.cls_id
    assert m1[1].sum() < m1[0].sum()
    # same word -> same id across batches
    assert ids1[0, 1] == ids1[1, 1]


def test_simple_tokenizer_native_path_matches_python():
    """The native-analyzer fast path (+ word-id memo) must be
    bit-identical to the pure-Python analyzer path — mixed-script text
    included (the rerank p50 fix must not shift any encoder input)."""
    from intool_rag_tpu.index.analyzer import tokenize as py_tokenize

    texts = [
        "Hello, WORLD!  Multi-  line\ttext 123",
        "Überflüssig naïve café — résumé",
        "中文混合 latin 字符 bigrams 42",
        "",
        "the a an of (stopwords only)",
    ]
    tok = SimpleTokenizer(vocab_size=512)
    ids_fast, m_fast = tok.encode_batch(texts)
    slow = SimpleTokenizer(vocab_size=512)
    slow._words = py_tokenize  # force the pure-Python analyzer
    ids_slow, m_slow = slow.encode_batch(texts)
    np.testing.assert_array_equal(ids_fast, ids_slow)
    np.testing.assert_array_equal(m_fast, m_slow)


def test_encoder_long_sequence_2048():
    """Long-context path (SURVEY §5.7: BGE-M3's 8192-token claim): a
    2048-token encode must produce finite unit embeddings, and padding
    past the content must not perturb them — verifies RoBERTa cumsum
    position ids beyond the 512 ceiling most encoders assume. (The TPU
    flash-attention kernel at these lengths is benchmarked in
    benchmarks/bench_longcontext.py; this is the CPU correctness leg.)"""
    cfg = EncoderConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=2052, dtype="float32",
    )
    params = init_params(cfg)
    fn = encode_fn(cfg)
    rng = np.random.default_rng(0)
    content = 1800
    ids = np.full((1, 2048), 1, np.int32)
    ids[0, :content] = rng.integers(4, 512, content)
    mask = np.zeros((1, 2048), np.int32)
    mask[0, :content] = 1
    out = np.asarray(fn(params, ids, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    # same content, shorter buffer: identical embedding
    out_short = np.asarray(
        fn(params, ids[:, :content], np.ones((1, content), np.int32))
    )
    np.testing.assert_allclose(out, out_short, atol=3e-5)


def test_checkpoint_float16_roundtrip(tmp_path):
    """float16-stored checkpoints (save_encoder_checkpoint
    store_dtype="float16" — halves the artifact) load back as f32
    params and embed within f16 quantization error of the original."""
    from intool_rag_tpu.models.encoder import (
        EncoderConfig,
        encode_fn,
        init_params,
        load_encoder_checkpoint,
        save_encoder_checkpoint,
    )

    cfg = EncoderConfig(
        vocab_size=256, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position=40, dtype="float32",
    )
    params = init_params(cfg)
    path = tmp_path / "enc16.npz"
    save_encoder_checkpoint(path, cfg, params, store_dtype="float16")
    import jax

    cfg2, params2 = load_encoder_checkpoint(path)
    assert cfg2 == cfg
    leaves = jax.tree.leaves(params2)
    assert all(l.dtype != np.float16 for l in leaves)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 256, (4, 16)).astype(np.int32)
    mask = np.ones((4, 16), np.int32)
    fn = encode_fn(cfg)
    a = np.asarray(fn(params, ids, mask))
    b = np.asarray(fn(params2, ids, mask))
    cos = (a * b).sum(axis=1)
    assert (cos > 0.999).all(), cos
