"""Sharded hybrid parity: the mesh-sharded dense+BM25+fusion engine must
rank exactly like the single-device path on the same corpus (BASELINE.md
config #5; round-2 verdict item 1). Covers both fusion modes, streaming
appends (including a capacity regrowth), and CJK text on the sparse side.
"""

import numpy as np
import pytest

from intool_rag_tpu.index.bm25_index import BM25Index, BM25Params
from intool_rag_tpu.ops.fusion import (
    normalize_minmax,
    rrf_fusion,
    weighted_fusion,
)
from intool_rag_tpu.ops.topk import flat_topk
from intool_rag_tpu.parallel.mesh import corpus_mesh
from intool_rag_tpu.parallel.sharded_hybrid import ShardedHybrid

import jax.numpy as jnp

pytestmark = pytest.mark.multichip

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu 机器 学习 检索 模型 数据"
).split()


def _make_corpus(rng, n, dim):
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # UNIQUE doc lengths: the BM25 length norm then separates every
    # single-term-match score, so rankings have no ties — RRF (rank-based)
    # is only well-defined up to tie order, which the sharded engine may
    # legitimately break differently than the single-device index.
    lens = rng.permutation(n) + 5
    texts = [
        " ".join(rng.choice(_WORDS, size=lens[i])) for i in range(n)
    ]
    return texts, emb


def _ref_hybrid(texts, emb, q_texts, q_emb, kc, k, params, mode, cfg):
    """Single-device reference with the same kernels and fusion ops."""
    d_vals, d_rows = flat_topk(jnp.asarray(q_emb), jnp.asarray(emb), kc,
                               metric="ip")
    d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
    bm = BM25Index.build(texts, params)
    s_vals, s_rows = bm.topk(q_texts, kc)
    s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
    if mode == "rrf":
        return rrf_fusion(d_rows, s_rows, k, rrf_k=cfg.RRF_K)
    s_norm = normalize_minmax(s_vals)
    d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
    s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
    return weighted_fusion(d_rows, d_vals, s_rows, s_norm, k,
                           w_dense=cfg.VECTOR_WEIGHT, w_sparse=cfg.BM25_WEIGHT)


def _check_parity(sh_vals, sh_rows, ref_vals, ref_rows, gids, *,
                  rank_tolerant=False):
    """Sharded ids are interleaved global row ids; translate via the
    append-order gid list and compare scores (exact ranking up to fp
    ties, which random scores make negligible). ``rank_tolerant`` is for
    RRF: rank-based scores amplify ~2e-5 BM25 summation noise into
    whole-rank flips, so require top-set overlap instead of exact order."""
    if rank_tolerant:
        sh = np.asarray(sh_rows)
        ref = np.asarray(ref_rows)
        orig_of_gid = {int(g): i for i, g in enumerate(gids)}
        for qi in range(ref.shape[0]):
            got = {orig_of_gid.get(int(g), -1) for g in sh[qi]}
            want = set(ref[qi].tolist())
            overlap = len(got & want) / max(len(want), 1)
            assert overlap >= 0.9, f"q{qi}: top-k overlap {overlap}"
            top3 = [orig_of_gid.get(int(g), -1) for g in sh[qi][:3]]
            assert top3 == ref[qi][:3].tolist(), (
                f"q{qi}: top-3 {top3} != {ref[qi][:3]}"
            )
        return
    orig_of_gid = {int(g): i for i, g in enumerate(gids)}
    sh_orig = np.array(
        [[orig_of_gid.get(int(g), -1) for g in row] for row in np.asarray(sh_rows)]
    )
    ref_rows = np.asarray(ref_rows)
    # atol 2e-4: the BM25 segmented-sum kernel's long f32 cumsum gives
    # ~2e-5 score noise under different slot orders (measured); fused
    # scores inherit it through min-max normalization.
    np.testing.assert_allclose(
        np.asarray(sh_vals), np.asarray(ref_vals), rtol=5e-4, atol=2e-4
    )
    # id-level: allow permutations only within (noise-tolerant) ties
    sh_vals = np.asarray(sh_vals)
    for qi in range(ref_rows.shape[0]):
        mismatch = sh_orig[qi] != ref_rows[qi]
        for j in np.flatnonzero(mismatch):
            ties = np.isclose(sh_vals[qi], sh_vals[qi, j], rtol=1e-3, atol=2e-4)
            tied_ref = set(ref_rows[qi][ties])
            assert sh_orig[qi, j] in tied_ref, (
                f"q{qi} rank{j}: {sh_orig[qi, j]} not in tie group {tied_ref}"
            )


@pytest.mark.parametrize("mode", ["weighted", "rrf"])
def test_sharded_hybrid_matches_single_device(rng, mode, monkeypatch):
    monkeypatch.setenv("FUSION_MODE", mode)
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    cfg = config_mod.get_config()

    n, dim, kc, k = 300, 32, 50, 10
    texts, emb = _make_corpus(rng, n, dim)
    params = BM25Params(k1=1.5, b=0.75, p_max=512)  # no pruning at n=300

    mesh = corpus_mesh()
    engine = ShardedHybrid(dim, mesh, capacity_per_shard=64, params=params)
    gids = engine.append(texts, emb)
    assert engine.valid_n == n

    q_texts = [" ".join(rng.choice(_WORDS, size=5)) for _ in range(8)]
    q_emb = rng.standard_normal((8, dim)).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)

    sh_vals, sh_rows = engine.search(q_texts, jnp.asarray(q_emb), k,
                                     candidates=kc)
    ref_vals, ref_rows = _ref_hybrid(texts, emb, q_texts, q_emb, kc, k,
                                     params, mode, cfg)
    _check_parity(sh_vals, sh_rows, ref_vals, ref_rows, gids,
                  rank_tolerant=(mode == "rrf"))


def test_sharded_hybrid_streaming_append_parity(rng):
    """Append in batches (crossing a regrowth), query after each batch —
    every intermediate state must match a fresh single-device build."""
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    cfg = config_mod.get_config()

    dim, kc, k = 16, 30, 8
    params = BM25Params(k1=1.5, b=0.75, p_max=512)
    mesh = corpus_mesh()
    # capacity 8/shard → 64 rows total; the 3rd batch forces a regrow
    engine = ShardedHybrid(dim, mesh, capacity_per_shard=8, params=params)

    all_texts: list[str] = []
    all_emb = np.zeros((0, dim), np.float32)
    all_gids = np.zeros(0, np.int64)
    q_texts = [" ".join(rng.choice(_WORDS, size=5)) for _ in range(4)]
    q_emb = rng.standard_normal((4, dim)).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)

    for batch_size in (40, 20, 80):
        texts, emb = _make_corpus(rng, batch_size, dim)
        gids = engine.append(texts, emb)
        assert len(set(map(int, gids))) == batch_size
        all_texts += texts
        all_emb = np.concatenate([all_emb, emb])
        all_gids = np.concatenate([all_gids, gids])
        assert engine.valid_n == len(all_texts)

        sh_vals, sh_rows = engine.search(q_texts, jnp.asarray(q_emb), k,
                                         candidates=kc)
        ref_vals, ref_rows = _ref_hybrid(
            all_texts, all_emb, q_texts, q_emb,
            min(kc, len(all_texts)), k, params, "weighted", cfg,
        )
        _check_parity(sh_vals, sh_rows, ref_vals, ref_rows, all_gids)
    # ids must survive the regrowth: no collisions across batches
    assert len(set(map(int, all_gids))) == len(all_gids)


def test_sharded_hybrid_dense_only_mode(rng):
    dim = 16
    mesh = corpus_mesh()
    engine = ShardedHybrid(dim, mesh, capacity_per_shard=16)
    texts, emb = _make_corpus(rng, 64, dim)
    gids = engine.append(texts, emb)
    q = emb[:3]
    vals, rows = engine.search(texts[:3], jnp.asarray(q), 5, hybrid=False)
    # self-retrieval: each query's top hit is its own row
    np.testing.assert_array_equal(np.asarray(rows)[:, 0], gids[:3])


def test_sharded_hybrid_checkpoint_roundtrip(rng, tmp_path):
    """save() → load() must restore identical search results and keep
    accepting streaming appends (SURVEY §5.4 sharded checkpointing,
    extended to the hybrid engine)."""
    dim = 16
    params = BM25Params(k1=1.5, b=0.75, p_max=256)
    mesh = corpus_mesh()
    engine = ShardedHybrid(dim, mesh, capacity_per_shard=16, params=params)
    texts, emb = _make_corpus(rng, 80, dim)
    engine.append(texts, emb)

    q_texts = [" ".join(rng.choice(_WORDS, size=4)) for _ in range(4)]
    q_emb = rng.standard_normal((4, dim)).astype(np.float32)
    before_v, before_r = engine.search(q_texts, jnp.asarray(q_emb), 8)

    engine.save(tmp_path / "ckpt")
    restored = ShardedHybrid.load(tmp_path / "ckpt", mesh)
    after_v, after_r = restored.search(q_texts, jnp.asarray(q_emb), 8)
    np.testing.assert_allclose(
        np.asarray(before_v), np.asarray(after_v), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(before_r), np.asarray(after_r))

    # streaming continues after restore
    more_t, more_e = _make_corpus(rng, 24, dim)
    gids = restored.append(more_t, more_e)
    assert restored.valid_n == 104
    assert len(set(map(int, gids))) == 24
    v2, r2 = restored.search(q_texts, jnp.asarray(q_emb), 8)
    assert np.isfinite(np.asarray(v2)).all()


def test_sharded_hybrid_quantized_checkpoint_roundtrip(rng, tmp_path):
    """int8r planes (codes + scales + residual) survive save() → load()
    bit-exactly: restored searches match, and streaming appends continue
    on the quantized tiers (capacity tiers × sharding × checkpointing)."""
    dim = 128
    params = BM25Params(k1=1.5, b=0.75, p_max=256)
    mesh = corpus_mesh()
    engine = ShardedHybrid(
        dim, mesh, capacity_per_shard=128, params=params,
        quant="int8r", interpret=True,
    )
    texts, emb = _make_corpus(rng, 80, dim)
    engine.append(texts, emb)

    q_texts = [" ".join(rng.choice(_WORDS, size=4)) for _ in range(4)]
    q_emb = rng.standard_normal((4, dim)).astype(np.float32)
    before_v, before_r = engine.search(q_texts, jnp.asarray(q_emb), 8)

    engine.save(tmp_path / "ckpt8")
    restored = ShardedHybrid.load(tmp_path / "ckpt8", mesh)
    assert restored.corpus.quant == "int8r"
    restored.corpus.interpret = True  # CPU mesh
    # planes restored bit-exactly (int8 codes round-trip as integers)
    np.testing.assert_array_equal(
        np.asarray(engine.corpus.codes), np.asarray(restored.corpus.codes)
    )
    np.testing.assert_array_equal(
        np.asarray(engine.corpus.res), np.asarray(restored.corpus.res)
    )
    after_v, after_r = restored.search(q_texts, jnp.asarray(q_emb), 8)
    np.testing.assert_array_equal(np.asarray(before_r), np.asarray(after_r))
    np.testing.assert_allclose(
        np.asarray(before_v), np.asarray(after_v), rtol=1e-5, atol=1e-6
    )

    # streaming continues on the quantized planes after restore
    more_t, more_e = _make_corpus(rng, 24, dim)
    gids = restored.append(more_t, more_e)
    assert restored.valid_n == 104
    v2, r2 = restored.search(more_t[:2], jnp.asarray(more_e[:2]), 3)
    np.testing.assert_array_equal(np.asarray(r2)[:, 0], gids[:2])
