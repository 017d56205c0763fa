"""Config #4 (BASELINE.md): hybrid retrieve top-100 → cross-encoder
rerank top-10, at bge-reranker-v2-m3 dimensions (hidden 1024, 24 layers
— random weights; FLOPs and latency are weight-independent) over 100
candidates × ~200 tokens, with length-bucketed pair batching
(padding waste target < 20%, SURVEY §7.3 #7).

Emits: rerank-only latency, retrieve→rerank end-to-end p50, padding
waste, plus the small-config number for regression comparison."""

import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import device_corpus, emit


def run_config(config, candidates, query, label, backend, packed=False):
    from intool_rag_tpu.models.reranker import Reranker

    reranker = Reranker.create(config)
    reranker.packed = packed
    reranker.rerank(query, candidates, top_k=10)  # compile buckets
    times = []
    for i in range(5):
        q = f"{query} variant{i}"
        t0 = time.perf_counter()
        out = reranker.rerank(q, candidates, top_k=10)
        times.append(time.perf_counter() - t0)
    assert len(out) == 10
    times.sort()
    emit(
        f"rerank_latency_ms_100to10_{label}",
        times[len(times) // 2] * 1000,
        "ms",
        backend=backend,
        min_ms=round(times[0] * 1000, 1),
        padding_waste=round(reranker.last_padding_waste, 4),
        layers=config.num_layers,
        hidden=config.hidden_size,
    )
    return reranker


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.models.encoder import EncoderConfig
    from intool_rag_tpu.ops.topk import flat_topk

    rng = np.random.default_rng(0)
    vocabulary = [f"term{i}" for i in range(2000)]
    # ~200 tokens per candidate (the realistic chunk length of config #4)
    candidates = [
        {
            "text": " ".join(
                rng.choice(vocabulary, size=int(rng.integers(120, 260)))
            ),
            "chunk_id": i,
        }
        for i in range(100)
    ]
    query = "term1 term2 term3 relevance question"

    # small config (round-1 comparable)
    small = EncoderConfig(
        vocab_size=4096, hidden_size=128, num_layers=4, num_heads=4,
        intermediate_size=512, max_position=516,
        dtype="bfloat16" if backend == "tpu" else "float32",
    )
    run_config(small, candidates, query, "small", backend)

    if backend != "tpu":
        return  # full-size model is a TPU-only measurement

    # bge-reranker-v2-m3 dimensions (BASELINE.md config #4)
    full = EncoderConfig(
        vocab_size=16_384, hidden_size=1024, num_layers=24, num_heads=16,
        intermediate_size=4096, max_position=1026, dtype="bfloat16",
    )
    reranker = run_config(full, candidates, query, "bge_m3_dims", backend)
    # ragged packing: same pairs, block-diagonal attention, ~0 padding
    run_config(full, candidates, query, "bge_m3_dims_packed", backend,
               packed=True)

    # end-to-end: dense retrieve top-100 over 100k×1024 + full rerank
    n = 100_000
    corpus = device_corpus(n, 1024, dtype="bfloat16")
    qv = jax.random.normal(jax.random.PRNGKey(3), (1, 1024), jnp.float32)
    flat_topk(qv, corpus, 100, metric="cosine", block_n=n)  # compile
    times = []
    for i in range(5):
        qvi = jax.random.normal(jax.random.PRNGKey(10 + i), (1, 1024), jnp.float32)
        t0 = time.perf_counter()
        _, rows = flat_topk(qvi, corpus, 100, metric="cosine", block_n=n)
        np.asarray(rows)
        out = reranker.rerank(f"{query} v{i}", candidates, top_k=10)
        times.append(time.perf_counter() - t0)
    times.sort()
    emit(
        "retrieve100_rerank10_e2e_p50_ms",
        times[len(times) // 2] * 1000,
        "ms",
        backend=backend,
        corpus=n,
    )


if __name__ == "__main__":
    main()
