"""HISTORICAL round-1 configuration of the north-star hybrid bench
(blockwise XLA dense scan + 1-D sorted BM25 at p_max 4096) — kept to
compare kernel generations. The CURRENT headline path (split-query
Pallas dense + packed two-tier-row BM25 at p_max 512) lives in the
repo-root ``bench.py``; per-stage breakdowns in ``bench_stages.py``."""

import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import emit

N, D, Q, G = 1_000_000, 1024, 256, 4
VOCAB, TERMS, QT, P_MAX = 100_000, 64, 8, 4096
CANDIDATES, TOP_K = 100, 10


def make_sparse(rng):
    chunk_terms = (rng.zipf(1.2, size=(N, TERMS)) - 1) % VOCAB
    weights = rng.random((N, TERMS)).astype(np.float32) + 0.5
    sort_idx = np.argsort(chunk_terms, axis=1, kind="stable")
    st = np.take_along_axis(chunk_terms, sort_idx, axis=1)
    dup = np.concatenate([np.zeros((N, 1), bool), st[:, 1:] == st[:, :-1]], axis=1)
    keep = ~dup.ravel()
    flat_terms = st.ravel()[keep]
    flat_docs = np.repeat(np.arange(N, dtype=np.int32), TERMS)[keep]
    flat_w = np.take_along_axis(weights, sort_idx, axis=1).ravel()[keep]
    order = np.lexsort((-flat_w, flat_terms))
    flat_terms, flat_docs, flat_w = flat_terms[order], flat_docs[order], flat_w[order]
    df = np.bincount(flat_terms, minlength=VOCAB)
    counts = np.minimum(df, P_MAX)
    starts64 = np.zeros(VOCAB, np.int64)
    starts64[1:] = np.cumsum(df)[:-1]
    rank = np.arange(len(flat_terms), dtype=np.int64) - starts64[flat_terms]
    keep2 = rank < P_MAX
    docs_out = flat_docs[keep2]
    w_out = flat_w[keep2]
    term_start = np.zeros(VOCAB, np.int32)
    term_start[1:] = np.cumsum(counts[:-1]).astype(np.int32)
    post_docs = np.concatenate([docs_out, np.full(P_MAX, N, np.int32)])
    post_w = np.concatenate([w_out, np.zeros(P_MAX, np.float32)]).astype(np.float32)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5)).astype(np.float32)
    qterms = ((rng.zipf(1.2, size=(Q, QT)) - 1) % VOCAB).astype(np.int32)
    qtf = np.ones((Q, QT), np.float32)
    return term_start, counts.astype(np.int32), post_docs, post_w, idf, qterms, qtf


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = ensure_backend()
    if backend != "tpu":
        emit("hybrid_qps_per_chip_1M", 0, "skipped", reason="needs TPU")
        return
    from intool_rag_tpu.ops.bm25 import bm25_topk_sorted
    from intool_rag_tpu.ops.fusion import normalize_minmax, weighted_fusion
    from intool_rag_tpu.ops.topk import flat_topk

    rng = np.random.default_rng(0)
    starts, lens, post_docs, post_w, idf, qterms, qtf = make_sparse(rng)
    dev = [jnp.asarray(x) for x in (starts, lens, post_docs, post_w, idf)]
    qtf_d = jnp.asarray(qtf)

    @jax.jit
    def gen_corpus():
        c = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
        return (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(jnp.bfloat16)

    corpus = gen_corpus()

    def hybrid(q_dense, qt, corpus):
        d_vals, d_rows = flat_topk(
            q_dense, corpus, CANDIDATES, metric="cosine",
            block_n=500_000, use_approx=True,
        )
        s_vals, s_rows = bm25_topk_sorted(
            qt, qtf_d, *dev, CANDIDATES, n_docs=N, p_max=P_MAX,
        )
        d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
        s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        return weighted_fusion(d_rows, d_vals, s_rows, s_norm, TOP_K)

    @jax.jit
    def stream(corpus, dq_all, sq_all):
        def step(_, inp):
            dq, sq = inp
            return None, hybrid(dq, sq, corpus)

        _, out = jax.lax.scan(step, None, (dq_all, sq_all))
        return out

    make_q = jax.jit(lambda k: jax.random.normal(k, (G, Q, D), jnp.float32))
    dqs = [make_q(jax.random.PRNGKey(i + 1)) for i in range(4)]
    sqs = [jnp.asarray((qterms[None].repeat(G, 0) + 31 * i) % VOCAB) for i in range(4)]
    np.asarray(stream(corpus, dqs[-1], sqs[-1])[1])
    times = []
    for dq, sq in zip(dqs[:3], sqs[:3]):
        t0 = time.perf_counter()
        np.asarray(stream(corpus, dq, sq)[1])
        times.append(time.perf_counter() - t0)
    qps = Q * G / min(times)
    emit("hybrid_qps_per_chip_1M_d1024", qps, "queries/s", backend=backend)


if __name__ == "__main__":
    main()
