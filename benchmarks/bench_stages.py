"""Per-stage device-time breakdown of the hybrid query program at the
1M×d1024 operating point: dense top-k / BM25 top-k / fusion timed as
separate pipelined streams, plus a p_max sweep for the BM25 postings cap
(impact pruning) with recall impact vs the unpruned exact scorer.

Round-1 verdict: hybrid ran at <½ of dense-only throughput with no
breakdown to localize the cost — this benchmark is that breakdown.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import (  # noqa: E402
    CANDIDATES,
    DIM,
    G,
    N_QUERIES,
    TOP_K,
    effective_sizes,
    make_sparse,
)


def _stream_time(fn, inputs, *consts) -> float:
    """min-of-3 pipelined stream time; host fetch is the barrier."""
    import jax

    @jax.jit
    def stream(consts, batched):
        def step(_, inp):
            return None, fn(*inp, *consts)

        _, out = jax.lax.scan(step, None, batched)
        return out

    np.asarray(jax.tree.leaves(stream(consts, inputs[-1]))[0])  # compile
    times = []
    for inp in inputs[:3]:
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(stream(consts, inp))[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.ops.bm25 import (
        bm25_topk_rows_packed,
        build_row_layout,
    )
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas
    from intool_rag_tpu.ops.fusion import normalize_minmax, weighted_fusion
    from intool_rag_tpu.ops.topk import flat_topk, rescore_candidates

    n, vocab, p_max_full = effective_sizes(backend)
    rng = np.random.default_rng(0)
    on_tpu = backend == "tpu"
    # pad N to the Pallas kernel's 4096-row block (valid_n masks the tail)
    n_pad = -(-n // 4096) * 4096 if on_tpu else n

    @jax.jit
    def gen_corpus():
        c = jax.random.normal(jax.random.PRNGKey(7), (n_pad, DIM), jnp.float32)
        return (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(jnp.bfloat16)

    corpus = gen_corpus()
    make_q = jax.jit(
        lambda k: jax.random.normal(k, (G, N_QUERIES, DIM), jnp.float32)
    )
    dqs = [make_q(jax.random.PRNGKey(i + 1)) for i in range(4)]

    out: dict = {"backend": backend, "n": n, "q_batch": N_QUERIES}

    # ---- dense stage (the production path: split-query precise
    # Pallas kernel on TPU — in-kernel scores are exact, no rescore) ----
    def dense(q, corpus):
        if on_tpu:
            return flat_topk_pallas(
                q, corpus, CANDIDATES, group_l=32, valid_n=n, precise=True,
                tail="fold",
            )
        d_vals, d_rows = flat_topk(
            q, corpus, CANDIDATES, metric="cosine",
            block_n=min(500_000, n),
        )
        d_vals = rescore_candidates(q, corpus, d_rows, metric="cosine")
        return d_vals, d_rows

    t = _stream_time(dense, [(d,) for d in dqs], corpus)
    out["dense_qps"] = round(N_QUERIES * G / t, 1)
    out["dense_ms_per_batch"] = round(t / G * 1000, 2)

    # ---- int8 dense stage (DENSE_PATH=int8's kernel: int8×int8 MXU at
    # 2× bf16 MACs + half the corpus HBM bytes; split-query precise) ----
    if on_tpu:
        from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
        from intool_rag_tpu.ops.quant import quantize_int8

        corpus_q8 = jax.jit(quantize_int8)(corpus)
        jax.block_until_ready(corpus_q8[0])

        def dense_i8(q, cq, cs):
            return flat_topk_pallas_int8(
                q, cq, cs, CANDIDATES, group_l=32, valid_n=n, tail="fold",
            )

        t = _stream_time(dense_i8, [(d,) for d in dqs], *corpus_q8)
        out["dense_int8_qps"] = round(N_QUERIES * G / t, 1)
        out["dense_int8_ms_per_batch"] = round(t / G * 1000, 2)
        # selection agreement vs the bf16-precise path on one batch
        _, r8 = jax.jit(dense_i8)(dqs[0][0], *corpus_q8)
        _, rb = jax.jit(dense)(dqs[0][0], corpus)
        a, b = np.asarray(r8), np.asarray(rb)
        inter = np.mean(
            [len(set(x.tolist()) & set(y.tolist())) / CANDIDATES
             for x, y in zip(a, b)]
        )
        out["dense_int8_pool_overlap_vs_bf16"] = round(float(inter), 4)
        del corpus_q8

        # residual-plane variant (DENSE_PATH=int8r): 3rd int8 matmul for
        # ~15-bit corpus precision — bf16's bytes, ~0.75× its MXU time
        from intool_rag_tpu.ops.quant import quantize_int8_residual

        q8r, resr, s8r = jax.jit(quantize_int8_residual)(corpus)
        jax.block_until_ready(q8r)

        def dense_i8r(q, cq, cs, cr):
            return flat_topk_pallas_int8(
                q, cq, cs, CANDIDATES, corpus_res=cr, group_l=32,
                valid_n=n, tail="fold",
            )

        t = _stream_time(dense_i8r, [(d,) for d in dqs], q8r, s8r, resr)
        out["dense_int8r_qps"] = round(N_QUERIES * G / t, 1)
        out["dense_int8r_ms_per_batch"] = round(t / G * 1000, 2)
        del q8r, resr, s8r

    # ---- BM25 stage: p_max sweep ----
    out["bm25"] = {}
    for p_max in (512, 1024, 2048, 4096):
        if p_max > p_max_full:
            continue
        sparse = make_sparse(rng, n, vocab, p_max)
        starts, lens, post_docs, post_w, idf, qterms, qtf = sparse
        dev = [jnp.asarray(x) for x in (starts, lens, post_docs, post_w, idf)]
        qtf_d = jnp.asarray(qtf)
        sqs = [
            jnp.asarray((qterms[None].repeat(G, 0) + 31 * i) % vocab)
            for i in range(4)
        ]
        # the production BM25Index.topk layout, via the shared constructor
        rows = build_row_layout(
            dev[0], dev[1], dev[2], dev[3], n_docs=n, p_max=p_max,
        )
        rows_consts = (
            rows["term_row"], rows["term_hot"], rows["hot_docs"],
            rows["hot_w"], rows["cold_docs"], rows["cold_w"],
        )
        wmax = rows["term_wmax"]

        def bm25(qt, qtf_d, tr, th, hd, hw, cd, cw, idf_d, wmax_d):
            return bm25_topk_rows_packed(
                qt, qtf_d, tr, th, hd, hw, cd, cw, idf_d, CANDIDATES,
                n_docs=n, term_wmax=wmax_d,
            )

        t = _stream_time(
            bm25, [(s,) for s in sqs], qtf_d, *rows_consts, dev[4], wmax
        )
        # recall of pruned BM25 vs exact scipy on a query subsample.
        # NB: arrays must be jit ARGUMENTS, not closure captures — captured
        # device constants embed in the executable and 413 remote_compile.
        s_vals, s_rows = jax.jit(bm25)(
            jnp.asarray(qterms), qtf_d, *rows_consts, dev[4], wmax
        )
        import scipy.sparse as sp

        sub = 64
        indptr = np.zeros(vocab + 1, np.int64)
        indptr[1:] = np.cumsum(lens)
        nnz = int(indptr[-1])
        mat = sp.csr_matrix(
            (post_w[:nnz] * np.repeat(idf, lens), post_docs[:nnz], indptr),
            shape=(vocab, n),
        )
        qmat = sp.csr_matrix(
            (
                qtf[:sub].ravel(),
                qterms[:sub].ravel(),
                np.arange(0, (sub + 1) * qterms.shape[1], qterms.shape[1]),
            ),
            shape=(sub, vocab),
        )
        exact = (qmat @ mat).toarray()
        oracle = np.argsort(-exact, axis=1)[:, :TOP_K]
        got = np.asarray(s_rows)[:sub, :TOP_K]
        hits = sum(
            len(set(a.tolist()) & set(b.tolist())) for a, b in zip(got, oracle)
        )
        out["bm25"][p_max] = {
            "qps": round(N_QUERIES * G / t, 1),
            "ms_per_batch": round(t / G * 1000, 2),
            "recall@10_vs_exact": round(hits / oracle.size, 4),
        }

    # ---- fusion stage (fixed candidate pools) ----
    kd = CANDIDATES
    d_rows = jnp.asarray(
        rng.integers(0, n, (G, N_QUERIES, kd)).astype(np.int32)
    )
    d_vals = jnp.asarray(
        np.sort(rng.random((G, N_QUERIES, kd)).astype(np.float32))[:, :, ::-1].copy()
    )
    s_rows2 = jnp.asarray(
        rng.integers(0, n, (G, N_QUERIES, kd)).astype(np.int32)
    )
    s_vals2 = jnp.asarray(
        np.sort(rng.random((G, N_QUERIES, kd)).astype(np.float32))[:, :, ::-1].copy()
    )

    def fuse(dr, dv, sr, sv):
        return weighted_fusion(dr, dv, sr, normalize_minmax(sv), TOP_K)

    variants = [
        (
            jnp.asarray((np.asarray(d_rows) + i) % n),
            d_vals,
            jnp.asarray((np.asarray(s_rows2) + i) % n),
            s_vals2,
        )
        for i in range(4)
    ]
    t = _stream_time(fuse, variants)
    out["fusion_qps"] = round(N_QUERIES * G / t, 1)
    out["fusion_ms_per_batch"] = round(t / G * 1000, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
