"""k-means and IVF index tests vs exact-search oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.index.ivf_index import IVFFlatIndex
from intool_rag_tpu.ops.kmeans import assign_blockwise, kmeans


def _clustered(rng, n_clusters=16, per=200, d=32):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 5
    points = np.concatenate(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    return points, centers


def test_kmeans_recovers_clusters(rng):
    points, centers = _clustered(rng)
    centroids, assign = kmeans(jnp.asarray(points), 16, iters=15, seed=1)
    c = np.asarray(centroids)
    # every true center has a learned centroid within 1.0
    dists = np.linalg.norm(centers[:, None, :] - c[None, :, :], axis=2)
    assert (dists.min(axis=1) < 1.0).all()
    # assignments are consistent with nearest centroid
    a2 = np.asarray(assign_blockwise(jnp.asarray(points), centroids, block_n=512))
    assert (np.asarray(assign) == a2).all()


def test_lloyd_step_blockwise_matches_unblocked(rng):
    from intool_rag_tpu.ops.kmeans import lloyd_step_blockwise, update_centroids

    points = rng.standard_normal((1000, 16)).astype(np.float32)
    centroids = rng.standard_normal((12, 16)).astype(np.float32)
    a, sums, counts = lloyd_step_blockwise(
        jnp.asarray(points), jnp.asarray(centroids), block_n=96
    )
    a_ref = np.asarray(
        assign_blockwise(jnp.asarray(points), jnp.asarray(centroids))
    )
    np.testing.assert_array_equal(np.asarray(a), a_ref)
    sums_ref, counts_ref = update_centroids(jnp.asarray(points), jnp.asarray(a_ref), 12)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(sums_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(counts_ref))


def test_kmeans_no_empty_clusters(rng):
    points = rng.standard_normal((100, 8)).astype(np.float32)
    centroids, assign = kmeans(jnp.asarray(points), 10, iters=8)
    counts = np.bincount(np.asarray(assign), minlength=10)
    assert (counts > 0).sum() >= 8  # reseeding keeps clusters alive


def test_ivf_high_recall_with_enough_probes(rng):
    points, _ = _clustered(rng, n_clusters=16, per=200)
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    queries = points[rng.integers(0, len(points), 20)]
    index = IVFFlatIndex.build(jnp.asarray(points), nlist=16, iters=8)
    oracle = np.argsort(-(queries @ points.T), axis=1)[:, :10]
    vals, rows = index.search(jnp.asarray(queries), 10, nprobe=16)  # all lists
    got = np.asarray(rows)
    hits = sum(len(set(a) & set(b)) for a, b in zip(got.tolist(), oracle.tolist()))
    assert hits / oracle.size >= 0.999  # full probe == exact (incl. overflow)
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_ivf_nprobe_recall_tradeoff(rng):
    points, _ = _clustered(rng, n_clusters=32, per=100)
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    queries = points[rng.integers(0, len(points), 20)]
    index = IVFFlatIndex.build(jnp.asarray(points), nlist=32, iters=8)
    oracle = np.argsort(-(queries @ points.T), axis=1)[:, :10]

    def recall(nprobe):
        _, rows = index.search(jnp.asarray(queries), 10, nprobe=nprobe)
        got = np.asarray(rows).tolist()
        return sum(len(set(a) & set(b)) for a, b in zip(got, oracle.tolist())) / oracle.size

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 >= 0.9  # clustered data: 8/32 probes ≈ full recall


def test_ivf_overflow_spill(rng):
    """Highly skewed data: overflow tail keeps recall exact at full probe."""
    points = rng.standard_normal((500, 16)).astype(np.float32) * 0.01
    points[0] += 10  # one outlier cluster, rest collapse into few lists
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    index = IVFFlatIndex.build(jnp.asarray(points), nlist=8, iters=5, cap_quantile=0.5)
    assert index.overflow_len > 0  # skew forced a spill
    queries = points[:5]
    oracle = np.argsort(-(queries @ points.T), axis=1)[:, :5]
    _, rows = index.search(jnp.asarray(queries), 5, nprobe=8)
    got = np.asarray(rows)
    hits = sum(len(set(a) & set(b)) for a, b in zip(got.tolist(), oracle.tolist()))
    assert hits / oracle.size >= 0.95


def test_index_kind_ivf_routing(rng, tmp_storage, monkeypatch):
    """INDEX_KIND=ivf routes DenseFlatIndex.search through the IVF path,
    rebuilding lazily when the store mutates."""
    monkeypatch.setenv("INDEX_KIND", "ivf")
    monkeypatch.setenv("IVF_NLIST", "16")
    monkeypatch.setenv("IVF_NPROBE", "16")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.index.chunk_store import ChunkStore
    from intool_rag_tpu.index.flat_index import DenseFlatIndex

    n = 5000
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_{i:06d}" for i in range(n)], [0] * n,
                 ["t"] * n)
    index = DenseFlatIndex(store)
    q = jnp.asarray(emb[:4])
    vals, rows = index.search(q, 5)
    assert index._ivf is not None  # IVF path taken
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2, 3]  # self-retrieval
    built_at = index._ivf_built_at
    # mutation invalidates the partition
    store.append(emb[:4] * 0 + emb[:4], "d2", [f"x{i}" for i in range(4)],
                 [0] * 4, ["t"] * 4)
    index.search(q, 5)
    assert index._ivf_built_at != built_at
    # exact=True bypasses IVF
    vals2, rows2 = index.search(q, 5, exact=True)
    assert np.asarray(rows2)[:, 0].tolist() == [0, 1, 2, 3]


def test_ivf_row_map_valid(rng):
    points = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFFlatIndex.build(jnp.asarray(points), nlist=8, iters=4)
    _, rows = index.search(jnp.asarray(points[:3]), 5, nprobe=8)
    r = np.asarray(rows)
    assert r.min() >= 0 and r.max() < 300
    # self-retrieval at rank 1 (MIPS on unnormalized data may differ; use
    # normalized to be strict)
    pn = points / np.linalg.norm(points, axis=1, keepdims=True)
    index2 = IVFFlatIndex.build(jnp.asarray(pn), nlist=8, iters=4)
    _, rows2 = index2.search(jnp.asarray(pn[:3]), 1, nprobe=8)
    assert np.asarray(rows2)[:, 0].tolist() == [0, 1, 2]
