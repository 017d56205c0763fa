"""Dense search kernels vs a NumPy brute-force oracle (the FAISS-parity
strategy from SURVEY.md §4: recall@k against exact search)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.ops.flat_pallas import choose_group_width, flat_topk_pallas
from intool_rag_tpu.ops.topk import exact_scores, flat_topk, merge_topk


def _normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _oracle_topk(queries, corpus, k, metric="cosine"):
    if metric == "l2":
        scores = -(
            np.sum(corpus**2, axis=1)[None, :]
            - 2.0 * (queries.astype(np.float64) @ corpus.T.astype(np.float64))
        )
    else:
        scores = queries.astype(np.float64) @ corpus.T.astype(np.float64)
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def recall_at_k(pred_idx, true_idx):
    hits = sum(
        len(set(p.tolist()) & set(t.tolist())) for p, t in zip(pred_idx, true_idx)
    )
    return hits / true_idx.size


def test_merge_topk():
    va = jnp.array([[9.0, 5.0, 1.0]])
    ia = jnp.array([[10, 11, 12]])
    vb = jnp.array([[7.0, 6.0, 0.0]])
    ib = jnp.array([[20, 21, 22]])
    v, i = merge_topk(va, ia, vb, ib, 3)
    assert v.tolist() == [[9.0, 7.0, 6.0]]
    assert i.tolist() == [[10, 20, 21]]


@pytest.mark.parametrize("metric", ["cosine", "ip", "l2"])
def test_flat_topk_exact_parity(rng, metric):
    corpus = _normed(rng, (1000, 64)) if metric != "l2" else rng.standard_normal((1000, 64)).astype(np.float32)
    queries = _normed(rng, (7, 64)) if metric != "l2" else rng.standard_normal((7, 64)).astype(np.float32)
    vals, idx = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), 10, metric=metric, block_n=256
    )
    oracle_vals, oracle_idx = _oracle_topk(queries, corpus, 10, metric)
    r = recall_at_k(np.asarray(idx), oracle_idx)
    if r < 1.0:
        # f32 kernel vs f64 oracle: only near-ties at the rank-k boundary
        # may differ; every kernel pick must score within 1e-3 of oracle kth.
        kth = oracle_vals[:, -1]
        picked = np.take_along_axis(
            queries.astype(np.float64) @ corpus.T.astype(np.float64)
            if metric != "l2"
            else -(
                np.sum(corpus**2, axis=1)[None, :]
                - 2.0 * (queries.astype(np.float64) @ corpus.T.astype(np.float64))
            ),
            np.asarray(idx),
            axis=1,
        )
        assert np.all(picked >= kth[:, None] - 1e-3)
        assert r >= 0.95
    # scores sorted descending
    v = np.asarray(vals)
    assert np.all(np.diff(v, axis=1) <= 1e-6)


def test_flat_topk_valid_n_masks_padding(rng):
    corpus = _normed(rng, (100, 32))
    corpus[90:] = 100.0  # poison the padding region
    queries = _normed(rng, (3, 32))
    _, idx = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), 5, metric="ip", block_n=64, valid_n=90
    )
    assert np.asarray(idx).max() < 90


def test_flat_topk_cosine_score_space(rng):
    """Reference score space: clamped to [0,1] (faiss_index.py:87)."""
    corpus = _normed(rng, (50, 16))
    queries = -corpus[:2]  # anti-parallel → raw cosine -1 → clamped 0
    vals, _ = flat_topk(jnp.asarray(queries), jnp.asarray(corpus), 5, metric="cosine")
    v = np.asarray(vals)
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_flat_topk_cosine_padding_stays_neg_inf(rng):
    """Regression: the [0,1] cosine clamp must not resurrect masked
    padding rows (clip(-inf) would become 0.0 and leak into results)."""
    corpus = _normed(rng, (8, 16))
    queries = _normed(rng, (2, 16))
    vals, idx = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), 8,
        metric="cosine", block_n=8, valid_n=3,
    )
    v, i = np.asarray(vals), np.asarray(idx)
    assert np.all(i[np.isfinite(v)] < 3)
    assert np.all(v[:, 3:] == -np.inf)  # only 3 valid rows exist


def test_flat_topk_bf16_corpus(rng):
    corpus = _normed(rng, (512, 128))
    queries = _normed(rng, (4, 128))
    vals, idx = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus, dtype=jnp.bfloat16), 10, metric="ip"
    )
    _, oracle_idx = _oracle_topk(queries, corpus, 10, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.9  # bf16 rounding tolerance


def test_pallas_partial_topk_high_recall(rng):
    n, d, q, k = 4096, 128, 8, 10
    corpus = _normed(rng, (n, d))
    queries = _normed(rng, (q, d))
    l = choose_group_width(n, k)
    vals, idx = flat_topk_pallas(
        jnp.asarray(queries), jnp.asarray(corpus), k,
        block_n=512, group_l=l, interpret=True,
    )
    _, oracle_idx = _oracle_topk(queries, corpus, k, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.95
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_pallas_valid_n_and_query_padding(rng):
    n, d = 1024, 128
    corpus = _normed(rng, (n, d))
    corpus[1000:] = 50.0  # poison padding
    queries = _normed(rng, (3, d))  # q=3 → padded to 8 internally
    vals, idx = flat_topk_pallas(
        jnp.asarray(queries), jnp.asarray(corpus), 5,
        block_n=256, group_l=16, valid_n=1000, interpret=True,
    )
    assert idx.shape == (3, 5)
    assert np.asarray(idx).max() < 1000


def test_rescore_candidates(rng):
    from intool_rag_tpu.ops.topk import rescore_candidates

    corpus = _normed(rng, (100, 32))
    queries = _normed(rng, (3, 32))
    rows = jnp.asarray([[0, 5, -1], [7, 7, 2], [99, 1, -1]], jnp.int32)
    scores = np.asarray(rescore_candidates(jnp.asarray(queries), jnp.asarray(corpus), rows))
    # exact f32 parity with direct dot products
    for qi in range(3):
        for ki, row in enumerate(np.asarray(rows)[qi]):
            if row < 0:
                assert scores[qi, ki] == -np.inf
            else:
                want = np.clip(queries[qi] @ corpus[row], 0, 1)
                assert scores[qi, ki] == pytest.approx(want, abs=1e-6)
    # bf16 corpus: rescoring recovers near-f32 precision of stored values
    scores_bf = np.asarray(
        rescore_candidates(
            jnp.asarray(queries), jnp.asarray(corpus, dtype=jnp.bfloat16), rows
        )
    )
    assert np.isfinite(scores_bf[np.asarray(rows) >= 0]).all()


def test_choose_group_width():
    assert choose_group_width(1_000_000, 10) == 128
    assert choose_group_width(4096, 10) <= 64
    assert choose_group_width(512, 10) == 8


def test_flat_pallas_precise_split_query(rng):
    """precise=True (split-query 2-pass bf16) must reproduce the f32
    ranking that plain bf16 queries lose (round-3: replaces the separate
    candidate rescore)."""
    import jax.numpy as jnp

    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas

    n, d = 512, 128
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cb = jnp.asarray(corpus).astype(jnp.bfloat16)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    vals, rows = flat_topk_pallas(
        jnp.asarray(queries), cb, 10, block_n=128, group_l=1,
        interpret=True, tail="exact", precise=True,
    )
    # oracle: f32 queries × bf16 corpus (the storage precision)
    ref = queries @ np.asarray(cb.astype(jnp.float32)).T
    want_rows = np.argsort(-ref, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(rows), want_rows)
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(ref, axis=1)[:, ::-1][:, :10], rtol=2e-4
    )


def test_flat_pallas_int8_parity(rng):
    """int8 kernel (split-query precise): scores must match the
    dequantized-int8 oracle to float tolerance, and recall vs the f32
    exact oracle must be high on separable data."""
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8

    n, d, q, k = 1024, 128, 5, 10
    corpus = _normed(rng, (n, d))
    queries = _normed(rng, (q, d))
    q8, s8 = quantize_int8(jnp.asarray(corpus))
    vals, idx = flat_topk_pallas_int8(
        jnp.asarray(queries), q8, s8, k,
        block_n=128, group_l=1, interpret=True, tail="exact",
    )
    # oracle in the kernel's own precision class: f32 query ×
    # dequantized-int8 corpus (the split-query pass leaves query error
    # ~2^-15, far below the corpus's 2^-8)
    deq = np.asarray(q8, np.float32) * np.asarray(s8)[:, None]
    ref = queries @ deq.T
    want_rows = np.argsort(-ref, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), want_rows)
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(ref, axis=1)[:, ::-1][:, :k], rtol=3e-4
    )
    # selection quality vs the true f32 corpus
    _, oracle_idx = _oracle_topk(queries, corpus, k, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.9


def test_flat_pallas_int8_valid_n_and_fold_tail(rng):
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8

    n, d, q, k = 4096, 128, 3, 10
    corpus = _normed(rng, (n, d))
    corpus[4000:] = 1.0  # poison padding (unit-norm-scale rows)
    queries = _normed(rng, (q, d))
    q8, s8 = quantize_int8(jnp.asarray(corpus))
    vals, idx = flat_topk_pallas_int8(
        jnp.asarray(queries), q8, s8, k,
        block_n=512, group_l=4, valid_n=4000, interpret=True, tail="fold",
    )
    assert idx.shape == (q, k)
    assert np.asarray(idx).max() < 4000
    _, oracle_idx = _oracle_topk(queries[:, :], corpus[:4000], k, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.9
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_flat_pallas_int8_nonprecise_ranks(rng):
    """precise=False (single int8 matmul): 8-bit query rounding still
    ranks separable data correctly."""
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8

    n, d, q, k = 512, 128, 4, 5
    corpus = _normed(rng, (n, d))
    queries = _normed(rng, (q, d))
    q8, s8 = quantize_int8(jnp.asarray(corpus))
    _, idx = flat_topk_pallas_int8(
        jnp.asarray(queries), q8, s8, k,
        block_n=128, group_l=1, interpret=True, tail="exact", precise=False,
    )
    _, oracle_idx = _oracle_topk(queries, corpus, k, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.8


def test_flat_pallas_int8_residual_precision(rng):
    """corpus_res plane (DENSE_PATH=int8r): in-kernel scores must match
    the f32 oracle to ~2^-14 relative — materially tighter than both
    plain int8 (~2^-8) and a bf16 corpus (~2^-9) — and the returned
    ranking must equal the f32 oracle's on generic random data."""
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8_residual

    n, d, q, k = 1024, 128, 5, 10
    corpus = _normed(rng, (n, d))
    queries = _normed(rng, (q, d))
    q1, q2, s8 = quantize_int8_residual(jnp.asarray(corpus))
    # reconstruction: two int8 planes ≈ 15-bit corpus
    deq = (
        np.asarray(q1, np.float32) + np.asarray(q2, np.float32) / 128.0
    ) * np.asarray(s8)[:, None]
    assert np.max(np.abs(deq - corpus)) <= np.max(np.abs(corpus)) / 127 / 128
    vals, idx = flat_topk_pallas_int8(
        jnp.asarray(queries), q1, s8, k, corpus_res=q2,
        block_n=128, group_l=1, interpret=True, tail="exact",
    )
    ref = queries @ corpus.T
    want_rows = np.argsort(-ref, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), want_rows)
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(ref, axis=1)[:, ::-1][:, :k], rtol=2e-4,
        atol=2e-4,
    )
    # the dropped q2·c2 cross term bounds the score error at ~2^-14
    got = np.take_along_axis(ref, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(vals), got, rtol=0, atol=3e-4)


def test_flat_pallas_int8_residual_valid_n(rng):
    """Padding rows must stay masked with the residual plane active."""
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8_residual

    n, d, q, k = 4096, 128, 3, 10
    corpus = _normed(rng, (n, d))
    corpus[4000:] = 1.0  # poison padding
    queries = _normed(rng, (q, d))
    q1, q2, s8 = quantize_int8_residual(jnp.asarray(corpus))
    vals, idx = flat_topk_pallas_int8(
        jnp.asarray(queries), q1, s8, k, corpus_res=q2,
        block_n=512, group_l=4, valid_n=4000, interpret=True, tail="fold",
    )
    assert np.asarray(idx).max() < 4000
    _, oracle_idx = _oracle_topk(queries, corpus[:4000], k, "ip")
    assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.9
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)


def test_flat_pallas_tail_variants(rng):
    """fold/two tails must return a correctly-ranked pool with high
    recall vs the exact oracle (production dense path at 1M uses fold:
    one VPU fold-by-2 pass + a tight approx over the halved array)."""
    n, d, q, k = 8192, 128, 8, 10
    corpus = _normed(rng, (n, d))
    queries = _normed(rng, (q, d))
    _, oracle_idx = _oracle_topk(queries, corpus, k, "ip")
    for tail in ("fold", "two"):
        vals, idx = flat_topk_pallas(
            jnp.asarray(queries), jnp.asarray(corpus), k,
            block_n=512, group_l=4, interpret=True, tail=tail,
        )
        assert idx.shape == (q, k)
        assert recall_at_k(np.asarray(idx), oracle_idx) >= 0.95, tail
        assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6), tail
        # indices must address the rows whose scores were returned
        ref = queries @ corpus.T
        got = np.take_along_axis(ref, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(vals), got, rtol=1e-3, atol=1e-3)
