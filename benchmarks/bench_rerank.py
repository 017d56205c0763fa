"""Config #4: hybrid retrieve top-100 → cross-encoder rerank top-10,
end-to-end latency (BASELINE.md). Uses the tiny cross-encoder config
(architecture-faithful; real weights change quality, not the measured
pipeline shape)."""

import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import emit


def main() -> None:
    backend = ensure_backend()
    from intool_rag_tpu.models.encoder import EncoderConfig
    from intool_rag_tpu.models.reranker import Reranker

    rng = np.random.default_rng(0)
    vocabulary = [f"term{i}" for i in range(2000)]
    candidates = [
        {"text": " ".join(rng.choice(vocabulary, size=40)), "chunk_id": i}
        for i in range(100)
    ]
    config = EncoderConfig(
        vocab_size=4096, hidden_size=128, num_layers=4, num_heads=4,
        intermediate_size=512, max_position=516,
        dtype="bfloat16" if backend == "tpu" else "float32",
    )
    reranker = Reranker.create(config)
    query = "term1 term2 term3 relevance question"
    reranker.rerank(query, candidates, top_k=10)  # warmup/compile buckets
    times = []
    for i in range(3):
        q = f"{query} variant{i}"
        t0 = time.perf_counter()
        out = reranker.rerank(q, candidates, top_k=10)
        times.append(time.perf_counter() - t0)
    assert len(out) == 10
    emit(
        "rerank_latency_ms_100to10", min(times) * 1000, "ms",
        backend=backend, layers=config.num_layers, hidden=config.hidden_size,
    )


if __name__ == "__main__":
    main()
