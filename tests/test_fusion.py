"""Hybrid fusion ops vs straightforward Python oracles."""

import jax.numpy as jnp
import numpy as np

from intool_rag_tpu.ops.fusion import (
    normalize_minmax,
    rrf_fusion,
    weighted_fusion,
)


def test_weighted_fusion_union_semantics():
    # doc 10 in both lists, 11 dense-only, 12 sparse-only
    d_idx = jnp.array([[10, 11]])
    d_sc = jnp.array([[0.9, 0.8]])
    s_idx = jnp.array([[12, 10]])
    s_sc = jnp.array([[0.7, 0.6]])
    vals, ids = weighted_fusion(d_idx, d_sc, s_idx, s_sc, k=3, w_dense=0.7, w_sparse=0.3)
    got = dict(zip(np.asarray(ids)[0].tolist(), np.asarray(vals)[0].tolist()))
    assert np.isclose(got[10], 0.7 * 0.9 + 0.3 * 0.6)
    assert np.isclose(got[11], 0.7 * 0.8)
    assert np.isclose(got[12], 0.3 * 0.7)
    # no duplicate of id 10
    assert len(set(np.asarray(ids)[0].tolist())) == 3


def test_rrf_fusion_oracle():
    d_idx = jnp.array([[5, 6, 7]])
    s_idx = jnp.array([[7, 8, 5]])
    vals, ids = rrf_fusion(d_idx, s_idx, k=4, rrf_k=60)

    def rr(rank):
        return 1.0 / (60 + rank)

    want = {5: rr(1) + rr(3), 6: rr(2), 7: rr(3) + rr(1), 8: rr(2)}
    got = dict(zip(np.asarray(ids)[0].tolist(), np.asarray(vals)[0].tolist()))
    for doc, score in want.items():
        assert np.isclose(got[doc], score, rtol=1e-6)
    # ties between 5 and 7 — both above 6 and 8
    order = np.asarray(ids)[0].tolist()
    assert set(order[:2]) == {5, 7}


def test_rrf_handles_invalid_padding():
    d_idx = jnp.array([[5, -1]])
    s_idx = jnp.array([[5, -1]])
    vals, ids = rrf_fusion(d_idx, s_idx, k=2)
    assert np.asarray(ids)[0, 0] == 5
    assert np.asarray(vals)[0, 1] == -np.inf  # padding never ranks


def test_fusion_large_pool_oracle():
    """The sort-based join must stay exact at rerank-pool scale
    (Kd=Ks=500 — the O(K²) eq-matrix this replaced was capped ~200)."""
    rng = np.random.default_rng(3)
    q, kd, ks = 4, 500, 500
    n_docs = 1500
    d_idx = np.stack([rng.choice(n_docs, kd, replace=False) for _ in range(q)])
    s_idx = np.stack([rng.choice(n_docs, ks, replace=False) for _ in range(q)])
    d_sc = np.sort(rng.random((q, kd)).astype(np.float32))[:, ::-1].copy()
    s_sc = np.sort(rng.random((q, ks)).astype(np.float32))[:, ::-1].copy()
    vals, ids = weighted_fusion(
        jnp.asarray(d_idx), jnp.asarray(d_sc), jnp.asarray(s_idx),
        jnp.asarray(s_sc), k=20, w_dense=0.7, w_sparse=0.3,
    )
    for qi in range(q):
        oracle: dict[int, float] = {}
        for i, sc in zip(d_idx[qi], d_sc[qi]):
            oracle[int(i)] = oracle.get(int(i), 0.0) + 0.7 * float(sc)
        for i, sc in zip(s_idx[qi], s_sc[qi]):
            oracle[int(i)] = oracle.get(int(i), 0.0) + 0.3 * float(sc)
        want = sorted(oracle.items(), key=lambda kv: -kv[1])[:20]
        got_ids = np.asarray(ids)[qi].tolist()
        got_vals = np.asarray(vals)[qi]
        np.testing.assert_allclose(
            got_vals, [s for _, s in want], rtol=1e-5
        )
        assert set(got_ids) == {i for i, _ in want}

    # rrf at the same scale
    rvals, rids = rrf_fusion(jnp.asarray(d_idx), jnp.asarray(s_idx), k=20)
    for qi in range(q):
        oracle = {}
        for r, i in enumerate(d_idx[qi]):
            oracle[int(i)] = oracle.get(int(i), 0.0) + 1.0 / (61 + r)
        for r, i in enumerate(s_idx[qi]):
            oracle[int(i)] = oracle.get(int(i), 0.0) + 1.0 / (61 + r)
        want_scores = sorted(oracle.values(), reverse=True)[:20]
        np.testing.assert_allclose(np.asarray(rvals)[qi], want_scores, rtol=1e-6)


def test_normalize_minmax():
    x = jnp.array([[1.0, 3.0, 2.0]])
    out = np.asarray(normalize_minmax(x))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.5]], atol=1e-7)
