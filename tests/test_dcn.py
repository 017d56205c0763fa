"""Two-level (DCN, ICI) mesh tests on the 8-device CPU grid (2 simulated
slices × 4 chips): hierarchical top-k must equal the exact single-device
result, and hierarchical k-means must match the 1-D-mesh result
(SURVEY.md §5.8 — DCN-spanning sharding for the 10M config)."""

import numpy as np
import pytest

import jax.numpy as jnp

from intool_rag_tpu.ops.topk import flat_topk
from intool_rag_tpu.parallel.dcn import (
    dcn_mesh,
    hierarchical_flat_topk,
    hierarchical_kmeans,
    shard_corpus_dcn,
)

pytestmark = pytest.mark.multichip


def test_hierarchical_topk_exact(rng):
    mesh = dcn_mesh(n_dcn=2)
    assert mesh.shape == {"dcn": 2, "ici": 4}
    n, d, k = 1000, 32, 17
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((6, d)).astype(np.float32)
    sharded = shard_corpus_dcn(jnp.asarray(corpus), mesh)
    vals, rows = hierarchical_flat_topk(
        jnp.asarray(queries), sharded, k, mesh, valid_n=n, block_n=128
    )
    ref_vals, ref_rows = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k, metric="ip"
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5
    )
    # id parity up to equal-score ties
    v = np.asarray(vals)
    got, want = np.asarray(rows), np.asarray(ref_rows)
    for qi in range(len(got)):
        for j in np.flatnonzero(got[qi] != want[qi]):
            ties = np.isclose(v[qi], v[qi, j], rtol=1e-5)
            assert got[qi, j] in set(want[qi][ties])


def test_hierarchical_topk_k_exceeds_shard(rng):
    """k larger than one shard's rows: merge must still return k hits."""
    mesh = dcn_mesh(n_dcn=2)
    n, d, k = 64, 8, 20  # 8 rows per shard < k
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    sharded = shard_corpus_dcn(jnp.asarray(corpus), mesh)
    q = jnp.asarray(corpus[:2])
    vals, rows = hierarchical_flat_topk(q, sharded, k, mesh, valid_n=n,
                                        block_n=8)
    assert vals.shape == (2, k)
    ref_vals, _ = flat_topk(q, jnp.asarray(corpus), k, metric="ip")
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(rows)[:, 0] == np.arange(2)).all()


def test_hierarchical_kmeans_matches_clusters(rng):
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    pts = np.concatenate(
        [c + rng.standard_normal((96, 16)).astype(np.float32) for c in centers]
    )
    mesh = dcn_mesh(n_dcn=2)
    sharded = shard_corpus_dcn(jnp.asarray(pts), mesh)
    centroids, assign = hierarchical_kmeans(
        sharded, 8, mesh, valid_n=len(pts), iters=10
    )
    c = np.asarray(centroids)
    dists = np.linalg.norm(centers[:, None, :] - c[None, :, :], axis=2)
    assert (dists.min(axis=1) < 1.0).all()
    a = np.asarray(assign)
    assert (a[: len(pts)] >= 0).all()
