"""DCN-mesh hybrid parity (round-3 verdict item 9): the 2-level
(dcn, ici) hybrid must rank exactly like the 1-D sharded engine on the
same corpus — same per-shard kernels, same interleaved row ids, same
fusion; only the merge topology (ICI-first hierarchical) differs, and
each merge stage keeps k survivors so the hierarchy is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.index.bm25_index import BM25Params
from intool_rag_tpu.parallel.dcn import DCNHybrid, dcn_mesh
from intool_rag_tpu.parallel.mesh import corpus_mesh
from intool_rag_tpu.parallel.sharded_hybrid import ShardedHybrid

pytestmark = pytest.mark.multichip

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


def _make_corpus(rng, n, dim):
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    lens = rng.permutation(n) + 5  # unique lengths → tie-free BM25
    texts = [" ".join(rng.choice(_WORDS, size=lens[i])) for i in range(n)]
    return texts, emb


@pytest.mark.parametrize("hybrid", [True, False])
def test_dcn_hybrid_matches_flat_sharded(rng, hybrid):
    devices = jax.devices()
    dmesh = dcn_mesh(devices, n_dcn=2)
    fmesh = corpus_mesh(devices)
    texts, emb = _make_corpus(rng, 96, 64)
    params = BM25Params(k1=1.5, b=0.75, p_max=64)

    dcn = DCNHybrid(64, dmesh, capacity_per_shard=32, params=params)
    flat = ShardedHybrid(64, fmesh, capacity_per_shard=32, params=params)
    g1 = dcn.append(texts, emb)
    g2 = flat.append(texts, emb)
    np.testing.assert_array_equal(g1, g2)  # identical placement → same ids

    q_texts, q_emb = texts[:4], jnp.asarray(emb[:4])
    dv, dr = dcn.search(q_texts, q_emb, 5, hybrid=hybrid)
    fv, fr = flat.search(q_texts, q_emb, 5, hybrid=hybrid)
    np.testing.assert_array_equal(np.asarray(dr), np.asarray(fr))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(fv), atol=2e-5)


def test_dcn_hybrid_streaming_append(rng):
    devices = jax.devices()
    dmesh = dcn_mesh(devices, n_dcn=2)
    texts, emb = _make_corpus(rng, 64, 64)
    dcn = DCNHybrid(
        64, dmesh, capacity_per_shard=8,
        params=BM25Params(k1=1.5, b=0.75, p_max=64),
    )
    gids1 = dcn.append(texts[:40], emb[:40])
    gids2 = dcn.append(texts[40:], emb[40:])  # forces regrowth (8/shard)
    assert dcn.valid_n == 64
    vals, rows = dcn.search(texts[:3], jnp.asarray(emb[:3]), 3, hybrid=True)
    # self-retrieval survives fusion (dense weight dominates)
    np.testing.assert_array_equal(
        np.asarray(rows)[:, 0], np.concatenate([gids1, gids2])[:3]
    )
    assert np.isfinite(np.asarray(vals)).all()


def test_dcn_hybrid_int8r_capacity_tier(rng):
    """Quantized dense planes compose with the DCN mesh: the per-shard
    int8 residual kernel runs under the hierarchical merge."""
    devices = jax.devices()
    dmesh = dcn_mesh(devices, n_dcn=2)
    texts, emb = _make_corpus(rng, 64, 64)
    dcn = DCNHybrid(
        64, dmesh, capacity_per_shard=128,
        params=BM25Params(k1=1.5, b=0.75, p_max=64),
        quant="int8r", interpret=True,
    )
    gids = dcn.append(texts, emb)
    vals, rows = dcn.search(
        texts[:4], jnp.asarray(emb[:4]), 5, hybrid=True, group_l=1,
        tail="exact",
    )
    np.testing.assert_array_equal(np.asarray(rows)[:, 0], gids[:4])
    # dense-only path too
    dvals, drows = dcn.search(
        texts[:4], jnp.asarray(emb[:4]), 5, hybrid=False, group_l=1,
        tail="exact",
    )
    np.testing.assert_array_equal(np.asarray(drows)[:, 0], gids[:4])
    # int8r scores ≈ exact f32 inner products (~15-bit corpus precision)
    self_scores = np.asarray(dvals)[:, 0]
    np.testing.assert_allclose(self_scores, 1.0, atol=5e-3)
