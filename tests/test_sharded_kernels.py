"""Sharded search through the fused Pallas kernels (round-3 verdict
item 2): per-shard selection must run the SAME kernels as the
single-chip path — bf16/f32 partial-top-k and the int8(+residual)
capacity tier — and merge to results that match the single-device
kernel on the union corpus. CPU mesh runs the kernels in interpret
mode; exactness comes from group_l=1 + tail="exact" (no partial-max
approximation), so parity assertions are strict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas, flat_topk_pallas_int8
from intool_rag_tpu.ops.quant import quantize_int8_residual
from intool_rag_tpu.ops.topk import flat_topk
from intool_rag_tpu.parallel.mesh import corpus_mesh
from intool_rag_tpu.parallel.sharded_corpus import ShardedCorpus
from intool_rag_tpu.parallel.sharded_search import (
    pallas_group_l,
    shard_corpus,
    sharded_flat_topk,
    sharded_flat_topk_int8,
)

N_DEV = 4
DIM = 128
K = 10


@pytest.fixture
def mesh():
    return corpus_mesh(jax.devices()[:N_DEV])


def _sort_pairs(vals, rows):
    """Canonical (score desc, row asc) order — merge order may differ
    between the sharded and single-device paths at score ties."""
    vals = np.asarray(vals, np.float64)
    rows = np.asarray(rows)
    order = np.lexsort((rows, -vals), axis=-1)
    return np.take_along_axis(vals, order, -1), np.take_along_axis(rows, order, -1)


def test_sharded_pallas_f32_matches_xla_exact(mesh, rng):
    n, valid = 4 * 256, 900
    corpus = rng.standard_normal((valid, DIM)).astype(np.float32)
    queries = rng.standard_normal((5, DIM)).astype(np.float32)
    sharded = shard_corpus(jnp.asarray(corpus), mesh, row_align=128)
    vals, rows = sharded_flat_topk(
        jnp.asarray(queries), sharded, K, mesh, valid_n=valid,
        kernel="pallas", group_l=1, tail="exact", interpret=True,
    )
    ref_vals, ref_rows = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), K, metric="ip",
        block_n=256,
    )
    sv, sr = _sort_pairs(vals, rows)
    rv, rr = _sort_pairs(ref_vals, ref_rows)
    np.testing.assert_array_equal(sr, rr)
    np.testing.assert_allclose(sv, rv, rtol=1e-5)
    assert sharded.shape[0] % (N_DEV * 128) == 0


def test_sharded_pallas_bf16_precise_matches_single_device(mesh, rng):
    n = 4 * 256
    corpus = jnp.asarray(
        rng.standard_normal((n, DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(rng.standard_normal((3, DIM)).astype(np.float32))
    sharded = shard_corpus(corpus, mesh, row_align=128)
    vals, rows = sharded_flat_topk(
        queries, sharded, K, mesh, valid_n=n,
        kernel="pallas", group_l=1, tail="exact", interpret=True,
    )
    # single-device kernel over the full corpus: per-row scores are
    # row-local (q_hi·c + q_lo·c), so the sharded merge must reproduce
    # them exactly
    ref_vals, ref_rows = flat_topk_pallas(
        queries, corpus, K, block_n=128, group_l=1, valid_n=n,
        precise=True, tail="exact", interpret=True,
    )
    sv, sr = _sort_pairs(vals, rows)
    rv, rr = _sort_pairs(ref_vals, ref_rows)
    np.testing.assert_array_equal(sr, rr)
    np.testing.assert_allclose(sv, rv, rtol=1e-6)


def test_pallas_group_l_alignment():
    assert pallas_group_l(1 << 20, 10) == 32
    assert pallas_group_l(4096, 10) == 16  # recall-targeted shrink
    assert pallas_group_l(256, 10) in (1, 2)  # 256 % 128 == 0
    assert pallas_group_l(100, 10) is None


def _int8r_oracle(rows_by_gid: np.ndarray, queries, k, valid):
    """Single-device int8-residual kernel over the interleaved corpus
    (per-shard counts equal → valid gids are exactly [0, valid))."""
    cap_rows = rows_by_gid.shape[0]
    q1, q2, s = quantize_int8_residual(jnp.asarray(rows_by_gid))
    return flat_topk_pallas_int8(
        jnp.asarray(queries), q1, s, k, corpus_res=q2,
        block_n=128, group_l=1, valid_n=valid, tail="exact",
        interpret=True,
    )


@pytest.mark.parametrize("quant", ["int8", "int8r"])
def test_sharded_corpus_quantized_parity(mesh, rng, quant):
    corpus = ShardedCorpus(
        DIM, mesh, capacity_per_shard=128, quant=quant, interpret=True
    )
    batch1 = rng.standard_normal((64, DIM)).astype(np.float32)
    batch2 = rng.standard_normal((32, DIM)).astype(np.float32)
    gids = np.concatenate([corpus.append(batch1), corpus.append(batch2)])
    assert corpus.valid_n == 96
    assert np.ptp(corpus.counts) <= 1

    queries = rng.standard_normal((4, DIM)).astype(np.float32)
    vals, rows = corpus.search(
        jnp.asarray(queries), K, group_l=1, tail="exact"
    )

    # interleaved union corpus: gid → row
    all_rows = np.concatenate([batch1, batch2])
    by_gid = np.zeros((corpus.cap * N_DEV, DIM), np.float32)
    by_gid[gids] = all_rows
    if quant == "int8r":
        ref_vals, ref_rows = _int8r_oracle(by_gid, queries, K, len(all_rows))
    else:
        from intool_rag_tpu.ops.quant import quantize_int8

        q8, s8 = quantize_int8(jnp.asarray(by_gid))
        ref_vals, ref_rows = flat_topk_pallas_int8(
            jnp.asarray(queries), q8, s8, K,
            block_n=128, group_l=1, valid_n=len(all_rows), tail="exact",
            interpret=True,
        )
    sv, sr = _sort_pairs(vals, rows)
    rv, rr = _sort_pairs(ref_vals, ref_rows)
    np.testing.assert_array_equal(sr, rr)
    np.testing.assert_allclose(sv, rv, rtol=1e-5)


def test_sharded_corpus_int8r_regrowth_preserves_ids(mesh, rng):
    corpus = ShardedCorpus(
        DIM, mesh, capacity_per_shard=128, quant="int8r", interpret=True
    )
    batch1 = rng.standard_normal((4 * 128, DIM)).astype(np.float32)
    gids1 = corpus.append(batch1)
    cap_before = corpus.cap
    batch2 = rng.standard_normal((64, DIM)).astype(np.float32)
    gids2 = corpus.append(batch2)  # forces regrowth
    assert corpus.cap > cap_before

    # self-retrieval: each appended row's top-1 is its own gid (rows are
    # random gaussians — the self inner product dominates w.h.p.)
    probe = np.concatenate([batch1[:3], batch2[:3]])
    expect = np.concatenate([gids1[:3], gids2[:3]])
    vals, rows = corpus.search(jnp.asarray(probe), 1, group_l=1, tail="exact")
    np.testing.assert_array_equal(np.asarray(rows)[:, 0], expect)
    assert bool(np.all(np.isfinite(np.asarray(vals))))


def test_sharded_flat_topk_int8_prefix_layout(mesh, rng):
    """Prefix-layout valid_n (flat_index's sharded int8 mirror path)."""
    valid = 700
    corpus = rng.standard_normal((valid, DIM)).astype(np.float32)
    q1, q2, s = quantize_int8_residual(jnp.asarray(corpus))
    codes = shard_corpus(q1, mesh, row_align=128)
    scales = shard_corpus(s, mesh, row_align=128)
    res = shard_corpus(q2, mesh, row_align=128)
    queries = rng.standard_normal((3, DIM)).astype(np.float32)
    vals, rows = sharded_flat_topk_int8(
        jnp.asarray(queries), codes, scales, K, mesh, res=res,
        valid_n=valid, group_l=1, tail="exact", interpret=True,
    )
    # prefix layout: shard_corpus pads the tail only, so global row =
    # shard·shard_rows + slot maps 1:1 to the original row index
    by_gid = np.zeros((codes.shape[0], DIM), np.float32)
    by_gid[:valid] = corpus
    ref_vals, ref_rows = _int8r_oracle(by_gid, queries, K, valid)
    sv, sr = _sort_pairs(vals, rows)
    rv, rr = _sort_pairs(ref_vals, ref_rows)
    np.testing.assert_array_equal(sr, rr)
    np.testing.assert_allclose(sv, rv, rtol=1e-5)
