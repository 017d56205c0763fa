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


def test_normalize_minmax():
    x = jnp.array([[1.0, 3.0, 2.0]])
    out = np.asarray(normalize_minmax(x))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.5]], atol=1e-7)
