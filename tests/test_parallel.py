"""Multi-chip tests on the 8-device CPU mesh: sharded search parity and
the sharded contrastive train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from intool_rag_tpu.models.encoder import EncoderConfig, init_params
from intool_rag_tpu.parallel.mesh import corpus_mesh, train_mesh
from intool_rag_tpu.parallel.sharded_search import shard_corpus, sharded_flat_topk
from intool_rag_tpu.train.contrastive import (
    TrainState,
    make_sharded_train_step,
    shard_params,
)

pytestmark = pytest.mark.multichip


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_sharded_flat_topk_matches_single_device(rng):
    n, d, q, k = 1000, 64, 5, 10  # n not divisible by 8 -> padding path
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    mesh = corpus_mesh()
    sharded = shard_corpus(jnp.asarray(corpus), mesh)
    assert sharded.shape[0] % 8 == 0
    vals, rows = sharded_flat_topk(
        jnp.asarray(queries), sharded, k, mesh, valid_n=n, block_n=128
    )
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    got = np.asarray(rows)
    assert got.shape == (q, k)
    hits = sum(len(set(a) & set(b)) for a, b in zip(got.tolist(), oracle.tolist()))
    assert hits / oracle.size >= 0.99
    assert got.max() < n  # no padding rows leak
    v = np.asarray(vals)
    assert np.all(np.diff(v, axis=1) <= 1e-6)


def test_sharded_topk_negative_scores_not_displaced_by_padding(rng):
    """The last shard is mostly zero padding; all real scores are
    NEGATIVE under 'ip'. Padding rows score exactly 0.0 and used to
    displace real candidates from the local top-k (ADVICE.md round 1) —
    the per-shard valid_n must mask them before selection."""
    n, d, q, k = 257, 32, 3, 8  # 257 rows over 8 shards → last shard ~1/33 valid
    corpus = -np.abs(rng.standard_normal((n, d))).astype(np.float32)
    queries = np.abs(rng.standard_normal((q, d))).astype(np.float32)  # all ip < 0
    mesh = corpus_mesh()
    sharded = shard_corpus(jnp.asarray(corpus), mesh)
    vals, rows = sharded_flat_topk(
        jnp.asarray(queries), sharded, k, mesh, valid_n=n, block_n=128
    )
    got = np.asarray(rows)
    v = np.asarray(vals)
    assert got.max() < n and got.min() >= 0, got
    assert np.all(v < 0)  # every returned score is a real (negative) score
    oracle = np.argsort(-(queries @ corpus.T), axis=1)[:, :k]
    for a, b in zip(got.tolist(), oracle.tolist()):
        assert set(a) == set(b)


def test_sharded_train_step_runs_and_reduces_loss():
    cfg = EncoderConfig.tiny()
    mesh = train_mesh()  # (4, 2) on 8 CPU devices
    assert mesh.shape == {"data": 4, "model": 2}
    params = shard_params(init_params(cfg), mesh)
    optimizer = optax.adamw(1e-3)
    step_fn, place_batch = make_sharded_train_step(cfg, optimizer, mesh)
    state = TrainState(params, optimizer.init(params))

    rng = np.random.default_rng(0)
    batch = place_batch(
        {
            "q_ids": rng.integers(4, cfg.vocab_size, (8, 16)).astype(np.int32),
            "q_mask": np.ones((8, 16), np.int32),
            "p_ids": rng.integers(4, cfg.vocab_size, (8, 16)).astype(np.int32),
            "p_mask": np.ones((8, 16), np.int32),
        }
    )
    losses = []
    for _ in range(5):
        state, loss = step_fn(state, batch)
        losses.append(float(loss))
    assert state.step == 5
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits the fixed batch


def test_dense_index_sharded_serving(rng, tmp_storage, monkeypatch):
    """SHARDED_SEARCH=on shards the serving index over all 8 CPU devices
    and matches single-device results."""
    monkeypatch.setenv("SHARDED_SEARCH", "on")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.index.chunk_store import ChunkStore
    from intool_rag_tpu.index.flat_index import DenseFlatIndex

    n = 3000
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_{i:06d}" for i in range(n)], [0] * n, ["t"] * n)
    index = DenseFlatIndex(store)
    q = jnp.asarray(emb[:4])
    vals, rows = index.search(q, 5)
    assert index._sharded is not None  # sharded path taken
    assert len(index._sharded[1][1].addressable_shards) == 8
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2, 3]
    # parity vs exact single-device
    _, rows_exact = index.search(q, 5, exact=True)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(rows_exact))
    # mutation invalidates the placement
    built = index._sharded_built_at
    store.append(emb[:2], "d2", ["x0", "x1"], [0, 0], ["t", "t"])
    index.search(q, 5)
    assert index._sharded_built_at != built


def test_tp_param_layout():
    cfg = EncoderConfig.tiny()
    mesh = train_mesh()
    params = shard_params(init_params(cfg), mesh)
    attn_q = params["params"]["layer_0"]["attention"]["query"]["kernel"]
    spec = attn_q.sharding.spec
    assert tuple(spec) == (None, "model")
    out_k = params["params"]["layer_0"]["mlp_output"]["kernel"]
    assert tuple(out_k.sharding.spec) == ("model", None)
    emb = params["params"]["word_emb"]["embedding"]
    assert all(s is None for s in tuple(emb.sharding.spec)) or tuple(emb.sharding.spec) == ()
