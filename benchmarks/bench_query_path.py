"""The FULL query path as one number (round-4 verdict item 1).

SURVEY §3.2/§7.1's stated design goal is that query embed → dense →
BM25 → fusion (→ rerank) collapse into ONE XLA program; the shipped
headline (bench.py) measures everything EXCEPT query embedding (the
reference runs embedding inside every query — page_retriever.py:109).
This bench compiles token-ids → encoder fwd (BGE-M3 dims, 24L/1024h
bf16) → int8r Pallas dense top-k → packed BM25 top-k → weighted fusion
→ top-10 as one jitted scan program at the headline operating point
(1M×d1024, 256-query batches) and reports three same-session rows:

- ``query_path_qps_kernel_only``   — pre-embedded (the old headline)
- ``query_path_qps_embed_included``— token ids in, top-10 out
- ``query_path_tokenize_ms_<Q>q``  — host analyzer cost (a pipelined
  service overlaps this with device compute; reported, not folded in)

plus the latency-path leg: one query served in an 8-slot micro-batch,
embed+hybrid, then cross-encoder rerank 100→10 at bge-reranker-v2-m3
dims — host tokenize included — as ``query_path_p50_ms_e2e_rerank``.

Weights are random: QPS/latency are weight-independent (quality is
proven separately in tests/test_encoder_quality.py and
tests/test_rerank_quality.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_query_path.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import chip_calibration, emit  # noqa: E402

SEQ_Q = 32  # tokens per query (realistic question length)


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    import bench as headline
    from intool_rag_tpu.models.encoder import (
        EncoderConfig,
        encode_fn,
        init_params,
    )
    from intool_rag_tpu.ops.bm25 import bm25_topk_rows_packed, build_row_layout
    from intool_rag_tpu.ops.fusion import normalize_minmax, weighted_fusion
    from intool_rag_tpu.ops.quant import quantize_int8_residual
    from intool_rag_tpu.ops.topk import flat_topk

    on_tpu = backend == "tpu"
    cal = chip_calibration()
    if on_tpu:
        n, vocab, p_max = headline.N_CHUNKS, headline.VOCAB, headline.P_MAX
        enc_cfg = EncoderConfig(
            vocab_size=64_000, max_position=514, flash_min_len=0
        )  # BGE-M3 body (24L/1024h/4096ffn); truncated vocab only trims
        #    the embedding TABLE (a gather — zero FLOP difference), the
        #    full 250k table costs 1 GB HBM better spent on the corpus
        q_batch, g = headline.N_QUERIES, 4
    else:
        n, vocab, p_max = 100_000, 30_000, 2048
        # keep hidden == corpus dim (the encoder output IS the query
        # vector); shrink depth/ffn for CPU smoke speed
        enc_cfg = EncoderConfig(
            vocab_size=2048, hidden_size=headline.DIM, num_layers=2,
            num_heads=16, intermediate_size=512, max_position=130,
            dtype="float32", flash_min_len=0,
        )
        q_batch, g = 64, 2
    k, cand = headline.TOP_K, headline.CANDIDATES

    rng = np.random.default_rng(0)
    sparse = headline.make_sparse(rng, n, vocab, p_max)
    starts, lens, post_docs, post_w, idf, qterms, qtf = sparse
    dev = [jnp.asarray(x) for x in (starts, lens, post_docs, post_w, idf)]
    rows_dev = build_row_layout(
        dev[0], dev[1], dev[2], dev[3], n_docs=n, p_max=p_max
    )
    jax.block_until_ready(rows_dev["hot_docs"])
    rows_tuple = (
        rows_dev["term_row"], rows_dev["term_hot"],
        rows_dev["hot_docs"], rows_dev["hot_w"],
        rows_dev["cold_docs"], rows_dev["cold_w"],
        rows_dev["term_wmax"],
    )
    qtf_d = jnp.asarray(qtf[:q_batch])

    n_pad = -(-n // 4096) * 4096 if on_tpu else n

    @jax.jit
    def gen_corpus():
        c = jax.random.normal(jax.random.PRNGKey(7), (n_pad, headline.DIM), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    if on_tpu:
        q8, res, s8 = jax.jit(quantize_int8_residual)(gen_corpus())
        jax.block_until_ready(q8)
        corpus_planes = (q8, res, s8)
    else:
        # threaded through ``planes`` like the TPU quantized planes —
        # a jit closure over the corpus embeds it as an executable
        # constant (CLAUDE.md: never close over big device arrays)
        corpus_planes = (gen_corpus().astype(jnp.bfloat16),)

    params = init_params(enc_cfg)
    jax.block_until_ready(params)
    enc = encode_fn(enc_cfg)
    print("# corpus + encoder ready", file=sys.stderr, flush=True)

    def dense_topk(q_dense, planes):
        if on_tpu:
            from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8

            q8, res, s8 = planes
            return flat_topk_pallas_int8(
                q_dense, q8, s8, cand, corpus_res=res, group_l=32,
                valid_n=n, tail="fold",
            )
        (corpus_bf16,) = planes
        return flat_topk(
            q_dense, corpus_bf16, cand, metric="cosine",
            block_n=min(500_000, n), valid_n=n,
        )

    def hybrid_from_dense(q_dense, qt, planes, rows, idf_d):
        d_vals, d_rows = dense_topk(q_dense, planes)
        d_vals = jnp.clip(d_vals, 0.0, 1.0)
        *row_arrs, wmax_d = rows
        # qtf_d is built at the full bench batch; the latency leg calls
        # with an 8-slot qt, so match its leading dim (static under jit)
        s_vals, s_rows = bm25_topk_rows_packed(
            qt, qtf_d[: qt.shape[0]], *row_arrs, idf_d, cand, n_docs=n,
            term_wmax=wmax_d,
        )
        d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
        s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        return weighted_fusion(d_rows, d_vals, s_rows, s_norm, k)

    @jax.jit
    def stream_embed(params, ids_all, mask, qt_all, planes, rows, idf_d):
        def step(_, inp):
            ids, qt = inp
            q_dense = enc(params, ids, mask)
            return None, hybrid_from_dense(q_dense, qt, planes, rows, idf_d)

        _, out = jax.lax.scan(step, None, (ids_all, qt_all))
        return out

    @jax.jit
    def stream_kernel(dq_all, qt_all, planes, rows, idf_d):
        def step(_, inp):
            dq, qt = inp
            return None, hybrid_from_dense(dq, qt, planes, rows, idf_d)

        _, out = jax.lax.scan(step, None, (dq_all, qt_all))
        return out

    make_ids = jax.jit(
        lambda key: jax.random.randint(
            key, (g, q_batch, SEQ_Q), 4, enc_cfg.vocab_size
        )
    )
    make_dq = jax.jit(
        lambda key: jax.random.normal(
            key, (g, q_batch, headline.DIM), jnp.float32
        )
    )
    mask = jnp.ones((q_batch, SEQ_Q), jnp.int32)
    ids_rot = [make_ids(jax.random.PRNGKey(i + 1)) for i in range(4)]
    dq_rot = [make_dq(jax.random.PRNGKey(i + 1)) for i in range(4)]
    qt_rot = [
        jnp.asarray((qterms[None, :q_batch].repeat(g, 0) + 31 * i) % vocab)
        for i in range(4)
    ]

    def timed(runner, inputs) -> float:
        np.asarray(runner(inputs[-1])[1])  # compile + warm
        times = []
        for x in inputs[:3]:
            t0 = time.perf_counter()
            np.asarray(runner(x)[1])
            times.append(time.perf_counter() - t0)
        return times

    planes_arg = corpus_planes
    print("# compiling kernel-only stream", file=sys.stderr, flush=True)
    t_kernel = timed(
        lambda i: stream_kernel(dq_rot[i[0]], qt_rot[i[0]], planes_arg,
                                rows_tuple, dev[4]),
        [(0,), (1,), (2,), (3,)],
    )
    qps_kernel = [q_batch * g / t for t in t_kernel]
    emit(
        "query_path_qps_kernel_only", float(np.mean(qps_kernel)), "queries/s",
        value_sd=round(float(np.std(qps_kernel)), 2), backend=backend,
        n=n, d=headline.DIM, batch=q_batch, **cal,
    )

    print("# compiling embed-included stream", file=sys.stderr, flush=True)
    t_embed = timed(
        lambda i: stream_embed(params, ids_rot[i[0]], mask, qt_rot[i[0]],
                               planes_arg, rows_tuple, dev[4]),
        [(0,), (1,), (2,), (3,)],
    )
    qps_embed = [q_batch * g / t for t in t_embed]
    emit(
        "query_path_qps_embed_included", float(np.mean(qps_embed)),
        "queries/s", value_sd=round(float(np.std(qps_embed)), 2),
        backend=backend, n=n, d=headline.DIM, batch=q_batch, seq=SEQ_Q,
        enc_layers=enc_cfg.num_layers, enc_hidden=enc_cfg.hidden_size,
        embed_ms_per_batch=round(
            (min(t_embed) - min(t_kernel)) / g * 1000, 2
        ),
        **cal,
    )

    # host tokenization cost for one 256-query batch (native analyzer);
    # a pipelined service overlaps this with device compute
    from intool_rag_tpu.models.tokenizer import get_tokenizer

    tok = get_tokenizer("bench", vocab_size=enc_cfg.vocab_size,
                        max_length=SEQ_Q)
    words = [f"what is the {w} of item {i}" for i, w in enumerate(
        ["total", "due date", "shipping mode", "status"] * 64
    )][:q_batch]
    tok.encode_batch(words)  # warm the memoized word→id cache (steady state)
    t0 = time.perf_counter()
    tok.encode_batch(words)
    tok_ms = (time.perf_counter() - t0) * 1000
    emit(f"query_path_tokenize_ms_{q_batch}q", tok_ms, "ms",
         backend=backend, queries=q_batch)

    # ---- latency leg: 1 query in an 8-slot micro-batch, embed+hybrid,
    # then rerank 100→10 at bge-reranker-v2-m3 dims, host tokenize incl.
    from intool_rag_tpu.models.reranker import Reranker

    rr_cfg = (
        EncoderConfig(vocab_size=64_000, max_position=514, flash_min_len=0)
        if on_tpu else EncoderConfig.tiny()
    )
    reranker = Reranker.create(rr_cfg)
    vocab_words = [f"term{i}" for i in range(2000)]
    cand_texts = [
        " ".join(rng.choice(vocab_words, size=int(rng.integers(120, 260))))
        for _ in range(cand)
    ]

    slot = 8
    mask8 = jnp.ones((slot, SEQ_Q), jnp.int32)

    @jax.jit
    def one_query(params, ids, qt, planes, rows, idf_d):
        q_dense = enc(params, ids, mask8)
        return hybrid_from_dense(q_dense, qt, planes, rows, idf_d)

    qt8 = jnp.asarray(qterms[:slot])
    questions = [f"what is the total due for invoice {i}" for i in range(6)]

    def serve(question: str):
        ids, _ = tok.encode_batch([question] * slot)
        ids = np.asarray(ids)
        if ids.shape[1] < SEQ_Q:
            ids = np.pad(ids, ((0, 0), (0, SEQ_Q - ids.shape[1])),
                         constant_values=1)
        vals, rows = one_query(
            params, jnp.asarray(ids[:, :SEQ_Q]), qt8, planes_arg,
            rows_tuple, dev[4],
        )
        np.asarray(rows)  # barrier: candidates back on host
        return reranker.rerank(question, [
            {"text": t, "score": 0.5} for t in cand_texts
        ], top_k=10)

    serve(questions[0])  # compile both programs
    lat = []
    for q in questions[1:]:
        t0 = time.perf_counter()
        out = serve(q)
        lat.append(time.perf_counter() - t0)
    assert len(out) == 10
    lat.sort()
    emit(
        "query_path_p50_ms_e2e_rerank", lat[len(lat) // 2] * 1000, "ms",
        backend=backend, min_ms=round(lat[0] * 1000, 1),
        rerank_layers=rr_cfg.num_layers, candidates=cand, **cal,
    )


if __name__ == "__main__":
    main()
