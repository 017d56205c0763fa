"""Decompose the SERVICE-level per-search latency on TPU.

bench_http measured /search p50 ~1.5 s even after the fused one-launch
search program (round 5) — far above the ~100 ms two launches (embed +
fused search) should cost. This probe builds the same corpus the HTTP
bench serves (48 docs × 40 paras ≈ 1.9k chunks) IN-PROCESS and times
each stage of `PageLevelRetriever.retrieve_chunks_batch` separately:

  tokenize → embed launch (+host fetch) → emb re-upload → BM25 query
  prep/upload → fused search launch → vals/rows fetch → host enrichment

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_service_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit  # noqa: E402


def main() -> None:
    os.environ.setdefault("EMBEDDING_PROVIDER", "tpu")
    os.environ.setdefault(
        "EMBEDDING_CHECKPOINT",
        "intool_rag_tpu/models/weights/encoder_mid.npz",
    )
    os.environ.setdefault("EMBEDDING_QUERY_INSTRUCTION", "")
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.eval.harness import build_engine_from_texts
    from intool_rag_tpu.llm.embeddings.factory import get_embedding_provider

    rng = np.random.default_rng(0)
    words = [f"term{i}" for i in range(4000)] + [
        "invoice", "total", "shipping", "warranty", "calibration",
        "manifest", "ledger", "quarterly", "balance", "discount",
    ]
    provider = get_embedding_provider()
    texts = [" ".join(rng.choice(words, size=80)) for _ in range(1920)]
    t0 = time.perf_counter()
    engine = build_engine_from_texts(texts, provider, dtype="bfloat16")
    print(f"# corpus built in {time.perf_counter()-t0:.1f}s "
          f"({engine.store.valid_n} chunks)", file=sys.stderr, flush=True)

    questions = [
        f"what is the {rng.choice(words)} of {rng.choice(words)}"
        for _ in range(256)
    ]

    def one(i: int, q_batch: int):
        qs = questions[(i * q_batch) % 200:][:q_batch]
        t = {}
        t0 = time.perf_counter()
        emb = provider.embed_batch(qs, is_query=True)
        t["embed_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        emb_dev = jnp.asarray(emb)
        emb_dev.block_until_ready()
        t["emb_upload_ms"] = (time.perf_counter() - t0) * 1000

        from intool_rag_tpu.config import get_config

        cfg = get_config()
        t0 = time.perf_counter()
        arrays, statics = engine.dense.flat_plan(50)
        statics.pop("k")
        qt, qf, b_arrays, b_statics = engine.bm25.topk_plan(qs)
        qt.block_until_ready()
        t["plan_ms"] = (time.perf_counter() - t0) * 1000

        from intool_rag_tpu.index.hybrid import _fused_hybrid_search

        t0 = time.perf_counter()
        vals, rows = _fused_hybrid_search(
            emb_dev, arrays, qt, qf, b_arrays,
            cfg.VECTOR_WEIGHT, cfg.BM25_WEIGHT,
            k=50, kc=50, fusion_mode=cfg.FUSION_MODE, rrf_k=cfg.RRF_K,
            **statics, **b_statics,
        )
        rows.block_until_ready()
        t["fused_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        np.asarray(vals), np.asarray(rows)
        t["fetch_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        v2, r2 = engine.search(qs, emb_dev, 50)
        np.asarray(r2)
        t["engine_total_ms"] = (time.perf_counter() - t0) * 1000
        return t

    for q_batch in (1, 2, 8):
        one(0, q_batch)  # compile
        rows = [one(i + 1, q_batch) for i in range(8)]
        agg = {k: round(float(np.median([r[k] for r in rows])), 1)
               for k in rows[0]}
        emit("service_search_stage_ms", agg.pop("engine_total_ms"),
             "ms", backend=backend, q_batch=q_batch, **agg)


if __name__ == "__main__":
    main()
