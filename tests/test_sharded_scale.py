"""Sharded scale-out tests on the 8-device CPU mesh: distributed k-means,
sharded checkpoint/restore, and the streaming-ingest + sharded-query loop
(BASELINE.md config #5 at test scale, with CJK text on the sparse side)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.index.bm25_index import BM25Index
from intool_rag_tpu.parallel.mesh import corpus_mesh
from intool_rag_tpu.parallel.sharded_kmeans import sharded_kmeans
from intool_rag_tpu.parallel.sharded_search import shard_corpus, sharded_flat_topk
from intool_rag_tpu.storage.sharded import load_sharded, save_sharded

pytestmark = pytest.mark.multichip


def _clustered(rng, n_clusters=8, per=128, d=32):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 5
    pts = np.concatenate(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    return pts, centers


def test_sharded_kmeans_matches_clusters(rng):
    pts, centers = _clustered(rng)
    mesh = corpus_mesh()
    sharded = shard_corpus(jnp.asarray(pts), mesh)
    centroids, assign = sharded_kmeans(
        sharded, 8, mesh, valid_n=len(pts), iters=10
    )
    c = np.asarray(centroids)
    dists = np.linalg.norm(centers[:, None, :] - c[None, :, :], axis=2)
    assert (dists.min(axis=1) < 1.0).all()
    a = np.asarray(assign)
    assert a.shape[0] == sharded.shape[0]
    # padding rows are -1; valid rows have real assignments
    assert (a[: len(pts)] >= 0).all()
    assert (a[len(pts):] == -1).all()


def test_sharded_checkpoint_roundtrip(rng, tmp_path):
    mesh = corpus_mesh()
    data = rng.standard_normal((1024, 64)).astype(np.float32)
    sharded = shard_corpus(jnp.asarray(data), mesh)
    save_sharded(sharded, tmp_path / "corpus", meta={"valid_n": 1000})
    restored, meta = load_sharded(tmp_path / "corpus", mesh)
    assert meta == {"valid_n": 1000}
    np.testing.assert_allclose(np.asarray(restored), data, rtol=1e-6)
    # restored array is actually sharded over the mesh
    assert len(restored.addressable_shards) == 8


def test_incremental_sharded_corpus(rng):
    """Incremental appends (SURVEY §5.8(c)): rows land in-shard via
    dynamic scatter — O(batch) movement, stable global ids — and are
    immediately searchable; growth preserves ids and contents."""
    from intool_rag_tpu.parallel.sharded_corpus import ShardedCorpus

    mesh = corpus_mesh()
    d = 32
    corpus = ShardedCorpus(d, mesh, capacity_per_shard=32)
    all_rows: list[np.ndarray] = []
    all_vecs: list[np.ndarray] = []
    for batch_size in (100, 50, 7):
        batch = rng.standard_normal((batch_size, d)).astype(np.float32)
        batch /= np.linalg.norm(batch, axis=1, keepdims=True)
        rows = corpus.append(batch)
        assert len(np.unique(rows)) == batch_size  # no slot collisions
        all_rows.append(rows)
        all_vecs.append(batch)
    assert corpus.valid_n == 157
    # every appended vector retrieves itself at rank 1 under its global id
    queries = np.concatenate(all_vecs)[::9]
    want = np.concatenate(all_rows)[::9]
    vals, got = corpus.search(jnp.asarray(queries), k=1)
    assert np.asarray(got)[:, 0].tolist() == want.tolist()
    # force growth (capacity 8*32=256) and re-check old + new rows
    big = rng.standard_normal((300, d)).astype(np.float32)
    big /= np.linalg.norm(big, axis=1, keepdims=True)
    rows_big = corpus.append(big)
    assert corpus.valid_n == 457
    vals, got = corpus.search(jnp.asarray(queries), k=1)
    assert np.asarray(got)[:, 0].tolist() == want.tolist()  # ids stable
    vals, got = corpus.search(jnp.asarray(big[:5]), k=1)
    assert np.asarray(got)[:, 0].tolist() == rows_big[:5].tolist()
    # shards stay balanced (greedy placement)
    assert corpus.counts.max() - corpus.counts.min() <= 1


def test_streaming_ingest_and_sharded_query(rng):
    """Append a new batch to a sharded corpus (reshard), query across the
    union, with CJK BM25 on the sparse side."""
    mesh = corpus_mesh()
    d = 64
    base = rng.standard_normal((500, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    new = rng.standard_normal((100, d)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)

    sharded = shard_corpus(jnp.asarray(base), mesh)
    # streaming append: host concat of valid rows + reshard
    combined = np.concatenate([base, new])
    sharded2 = shard_corpus(jnp.asarray(combined), mesh)
    queries = jnp.asarray(new[:4])
    vals, rows = sharded_flat_topk(
        queries, sharded2, 3, mesh, valid_n=len(combined), block_n=64
    )
    # each new vector finds itself at rank 1 (appended rows searchable)
    assert np.asarray(rows)[:, 0].tolist() == [500, 501, 502, 503]

    # CJK sparse side over the same corpus ids
    texts = [f"doc {i} 发票金额 {i%7}" if i % 3 == 0 else f"doc {i} plain text"
             for i in range(600)]
    bm25 = BM25Index.build(texts)
    s_vals, s_rows = bm25.topk(["发票金额"], k=5)
    top = np.asarray(s_rows)[0]
    assert all(int(r) % 3 == 0 for r in top if np.asarray(s_vals)[0][list(top).index(r)] > 0)
