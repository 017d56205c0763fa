"""Streaming segmented residual index: append/search parity vs brute
force, capacity-doubling growth, skew overflow, and binary+refine mode.
Reference contract: faiss IVF add()/search() over a trained quantizer
(rag/storage/faiss_index.py) — here append-only segments at PQ-class
bytes/row."""

import numpy as np
import pytest

import jax.numpy as jnp

from intool_rag_tpu.index.segmented_residual import SegmentedResidualIndex


def _clustered(rng, n_clusters, per, d, spread=5.0):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * spread
    pts = np.concatenate(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    return pts[rng.permutation(len(pts))]


def test_segmented_append_and_recall(rng):
    d = 64
    pts = _clustered(rng, 16, 64, d)
    n = len(pts)
    index = SegmentedResidualIndex.train(
        jnp.asarray(pts[:512]), nlist=16, iters=8, seg_rows=256,
    )
    # 4 appends, one short — crosses the pow2 capacity growth at 2→4
    gids = []
    for start in range(0, n, 256):
        chunk = pts[start : start + 256]
        got = index.append(jnp.asarray(chunk))
        gids.append(got)
    gids = np.concatenate(gids)
    np.testing.assert_array_equal(gids, np.arange(n))
    assert index.n_segments == 4
    assert index.total_rows == n

    queries = pts[rng.integers(0, n, 16)] + 0.2 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    vals, rows = index.search(jnp.asarray(queries), 10, nprobe=8)
    exact = queries @ pts.T
    want = np.argsort(-exact, axis=1)[:, :10]
    got = np.asarray(rows)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(16)]
    )
    assert recall >= 0.85, f"recall@10 {recall}"
    # scores track exact inner products (centroid part exact, int4
    # residual bounded by the group scale)
    top1 = exact[np.arange(16), got[:, 0]]
    rel = np.abs(np.asarray(vals)[:, 0] - top1) / np.abs(top1)
    assert rel.max() < 0.05, rel.max()


def test_segmented_matches_quantized_bruteforce(rng):
    """With nprobe = nlist the segment scan must return the EXACT top-k
    of the quantized score model (centroid + dequantized residual) —
    verified against a NumPy oracle using the same codec."""
    from intool_rag_tpu.index.ivf_residual import dequantize_int4

    d = 32
    pts = _clustered(rng, 8, 48, d, spread=3.0)
    n = len(pts)
    index = SegmentedResidualIndex.train(
        jnp.asarray(pts), nlist=8, iters=6, seg_rows=128,
    )
    for start in range(0, n, 128):
        index.append(jnp.asarray(pts[start : start + 128]))

    queries = rng.standard_normal((8, d)).astype(np.float32)
    vals, rows = index.search(jnp.asarray(queries), 5, nprobe=8)

    # oracle: reconstruct every stored row from the device arrays
    codes, scales, row_list, row_map = (
        np.asarray(index._store[0]), np.asarray(index._store[1]),
        np.asarray(index._store[2]), np.asarray(index._store[3]),
    )
    cents = np.asarray(index.centroids)
    recon = {}
    for c in range(index.n_segments):
        dec = np.asarray(
            dequantize_int4(jnp.asarray(codes[c]), jnp.asarray(scales[c]))
        )
        for slot in range(codes.shape[1]):
            gid = row_map[c, slot]
            if gid >= 0:
                recon[int(gid)] = cents[row_list[c, slot]] + dec[slot]
    assert len(recon) == n  # no row lost
    mat = np.stack([recon[i] for i in range(n)])
    oracle = queries @ mat.T
    want_top = np.sort(oracle, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(
        np.asarray(vals), want_top, rtol=1e-4, atol=1e-4
    )


def test_segmented_skew_overflow(rng):
    """All rows landing in ONE list must survive via the overflow spill
    into the segment's free space (cap only bounds the probed main
    region), and the host-int8 refine tier must recover exact ranking —
    near-duplicate points are below int4 residual resolution by design
    (see ivf_residual recall-test note)."""
    d = 16
    base = rng.standard_normal(d).astype(np.float32) * 10
    pts = (base + 0.01 * rng.standard_normal((96, d))).astype(np.float32)
    # train on scattered data so nlist > 1, then append the skewed blob
    train = rng.standard_normal((64, d)).astype(np.float32) * 10
    index = SegmentedResidualIndex.train(
        jnp.asarray(np.concatenate([train, pts[:8]])), nlist=8, iters=4,
        seg_rows=96, cap=8, refine=True,
    )
    index.append(jnp.asarray(pts))
    assert index.max_overflow == 96 - int(
        np.asarray(index._store[5][0]).sum()
    )
    # no row lost: a full-width search returns every gid
    vals, rows = index.search(jnp.asarray(pts[:2]), 96, nprobe=8)
    got_all = np.asarray(rows)
    assert set(got_all[0].tolist()) == set(range(96))
    # refine over the FULL candidate pool must reproduce the host-int8
    # oracle ranking exactly (near-duplicates at 0.01σ are below even
    # int8 score resolution, so the f32 oracle is not the right bar)
    vals, rows = index.search(
        jnp.asarray(pts[:4]), 4, nprobe=8, refine_k=96
    )
    got = np.asarray(rows)
    host8 = index.host_int8[0].astype(np.float32) * (
        index.host_scale8[0][:, None]
    )
    oracle = pts[:4] @ host8.T
    want = np.argsort(-oracle, axis=1)[:, :4]
    np.testing.assert_array_equal(np.sort(got, 1), np.sort(want, 1))


def test_segmented_binary_with_refine(rng):
    d = 64
    pts = _clustered(rng, 16, 64, d)
    n = len(pts)
    index = SegmentedResidualIndex.train(
        jnp.asarray(pts[:512]), nlist=16, iters=8, seg_rows=512,
        bits=1, refine=True,
    )
    for start in range(0, n, 512):
        index.append(jnp.asarray(pts[start : start + 512]))
    assert index.bytes_host > 0

    queries = pts[rng.integers(0, n, 16)] + 0.2 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    vals, rows = index.search(jnp.asarray(queries), 10, nprobe=8, refine_k=50)
    exact = queries @ pts.T
    want = np.argsort(-exact, axis=1)[:, :10]
    got = np.asarray(rows)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(16)]
    )
    assert recall >= 0.85, f"refined recall@10 {recall}"


def test_segmented_empty_and_validation(rng):
    index = SegmentedResidualIndex.train(
        jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32)),
        nlist=4, seg_rows=32,
    )
    vals, rows = index.search(
        jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32)), 5
    )
    assert (np.asarray(rows) == -1).all()
    with pytest.raises(ValueError, match="seg_rows"):
        index.append(
            jnp.asarray(rng.standard_normal((33, 16)).astype(np.float32))
        )
    with pytest.raises(ValueError, match="bits"):
        SegmentedResidualIndex(
            jnp.zeros((4, 16), jnp.float32), bits=2,
        )


def test_index_kind_segmented_routing(rng, tmp_storage, monkeypatch):
    """INDEX_KIND=segmented routes DenseFlatIndex.search through the
    streaming segment path; a store append encodes ONLY the new rows
    (same index object, total_rows advances), and a store swap (delete)
    rebuilds."""
    monkeypatch.setenv("INDEX_KIND", "segmented")
    monkeypatch.setenv("IVF_NLIST", "16")
    monkeypatch.setenv("IVF_NPROBE", "16")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.index.chunk_store import ChunkStore
    from intool_rag_tpu.index.flat_index import DenseFlatIndex
    from intool_rag_tpu.index.segmented_residual import (
        SegmentedResidualIndex,
    )

    n = 5000
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_{i:06d}" for i in range(n)], [0] * n,
                 ["t"] * n)
    index = DenseFlatIndex(store)
    q = jnp.asarray(emb[:4])
    vals, rows = index.search(q, 5)
    assert isinstance(index._ivf, SegmentedResidualIndex)
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2, 3]  # self-retrieval
    seg_obj = index._ivf
    assert seg_obj.total_rows == n
    # append: SAME index object, only the delta encoded
    store.append(emb[:4], "d2", [f"x{i}" for i in range(4)], [0] * 4,
                 ["t"] * 4)
    index.search(q, 5)
    assert index._ivf is seg_obj
    assert seg_obj.total_rows == n + 4
    # delete swaps the store (copy-on-write) → rebuild
    new_store, removed = store.without_doc("d2")
    assert removed == 4
    index2 = DenseFlatIndex(new_store)
    index2.search(q, 5)
    assert index2._ivf is not seg_obj
    assert index2._ivf.total_rows == n
    config_mod.reset_config()


def test_segmented_save_load_roundtrip(rng, tmp_path):
    d = 64
    pts = _clustered(rng, 8, 64, d)
    index = SegmentedResidualIndex.train(
        jnp.asarray(pts), nlist=8, iters=4, seg_rows=256, refine=True,
    )
    for start in range(0, len(pts), 256):
        index.append(jnp.asarray(pts[start : start + 256]))
    index.save(tmp_path / "seg")
    loaded = SegmentedResidualIndex.load(tmp_path / "seg")
    assert loaded.n_segments == index.n_segments
    assert loaded.total_rows == index.total_rows
    assert loaded.max_overflow == index.max_overflow
    q = jnp.asarray(pts[:8])
    v1, r1 = index.search(q, 10, nprobe=8, refine_k=30)
    v2, r2 = loaded.search(q, 10, nprobe=8, refine_k=30)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
