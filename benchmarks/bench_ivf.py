"""Config #3: IVF at the north-star scale — 1M × d1024 on TPU (20k × d256
on the CPU fallback). Builds the partition on device (blocked Lloyd
k-means), then sweeps nprobe vs recall@10 vs low-batch QPS against the
flat index at the same batch size (IVF's territory is low-batch latency
at large N; full-batch throughput belongs to the flat one-pass scan —
ARCHITECTURE.md §4).

Reference point: the reference only ever builds exact IndexFlatL2
(rag/storage/faiss_index.py:123); IVF is the declared scale-out step
(BASELINE.md config #3).
"""

import time

import numpy as np

from common import device_clustered_corpus, emit

from intool_rag_tpu.backend import ensure_backend

K = 10
LOW_Q = 16  # low-batch operating point
G = 64  # scan-pipelined batches per launch (amortizes the ~25-40 ms RPC)


def _stream_qps(search_fn, operands, n_q, d, seeds=(1, 2, 3)):
    """QPS of search_fn([Q, D], *operands) on a G-deep on-device stream.
    ``operands`` (the corpus / index arrays) are jit arguments, never
    closure constants (CLAUDE.md: captured big arrays get baked into the
    executable)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(qs, *ops):
        def step(_, q):
            vals, rows = search_fn(q, *ops)
            return None, (vals, rows)

        return jax.lax.scan(step, None, qs)[1]

    make = jax.jit(
        lambda k: jax.random.normal(k, (G, n_q, d), jnp.float32)
    )
    inputs = [make(jax.random.PRNGKey(s)) for s in seeds]
    np.asarray(stream(inputs[-1], *operands)[0])  # warmup/compile
    times = []
    for qs in inputs[:-1]:
        t0 = time.perf_counter()
        np.asarray(stream(qs, *operands)[0])
        times.append(time.perf_counter() - t0)
    return n_q * G / min(times)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.index.ivf_index import IVFFlatIndex
    from intool_rag_tpu.ops.topk import flat_topk

    backend = ensure_backend()
    on_tpu = backend == "tpu"
    n = 1_000_000 if on_tpu else 20_000
    d = 1024 if on_tpu else 256
    nlist = 4096 if on_tpu else 64
    corpus = device_clustered_corpus(
        n, d, n_clusters=1024 if on_tpu else 64, sigma=0.5,
        dtype="bfloat16" if on_tpu else "float32",
    )

    t0 = time.perf_counter()
    index = IVFFlatIndex.build(corpus, nlist=nlist, iters=8)
    jax.block_until_ready(index.permuted)
    build_s = time.perf_counter() - t0
    emit(
        f"ivf_build_seconds_{n//1000}k_d{d}_nlist{nlist}", build_s, "s",
        cap=index.cap, overflow_rows=index.overflow_len, backend=backend,
    )

    # recall oracle: exact f32-scored flat top-k on the same corpus.
    # corpus is an ARGUMENT, not a closure constant — a captured 2 GB
    # corpus gets embedded in the executable and stalls the remote
    # tunnel (CLAUDE.md benchmark rules).
    @jax.jit
    def noisy_queries(key, corpus):
        base = jax.lax.dynamic_slice(corpus, (0, 0), (64, d)).astype(jnp.float32)
        # noise norm ≈ 0.3 relative to the unit rows (per-dim std 0.3/√d)
        q = base + (0.3 / jnp.sqrt(jnp.float32(d))) * jax.random.normal(key, (64, d))
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    queries = noisy_queries(jax.random.PRNGKey(9), corpus)
    _, exact_rows = flat_topk(
        queries, corpus, K, metric="ip", block_n=min(250_000, n),
        use_approx=False,
    )
    exact = [set(r.tolist()) for r in np.asarray(exact_rows)]

    # flat index at the same low batch — the line IVF has to beat
    flat_qps = _stream_qps(
        lambda q, c: flat_topk(q, c, K, metric="ip", block_n=n),
        (corpus,), LOW_Q, d,
    )
    emit(f"flat_qps_batch{LOW_Q}", flat_qps, "queries/s", backend=backend)

    from intool_rag_tpu.index.ivf_index import _ivf_search

    ivf_ops = (
        index.centroids, index.permuted, index.row_map,
        index.list_start, index.list_len,
    )
    for nprobe in (4, 5, 6, 8, 16, 32):
        if nprobe > nlist:
            continue
        # bound the gathered candidate working set [Qc, nprobe*cap, d]
        # to ~2 GB f32 — nprobe 64 at cap 840 with Qc=64 is 14 GB (OOM)
        chunk = max(4, min(64, (512 * 1024 * 1024 // 4) // (nprobe * index.cap * d)))
        _, rows = index.search(queries, K, nprobe=nprobe, query_chunk=chunk)
        rows_np = np.asarray(rows)
        rec = sum(
            len(exact[i] & set(r.tolist())) for i, r in enumerate(rows_np)
        ) / (64 * K)
        qps = _stream_qps(
            lambda q, c, p, rm, ls, ll: _ivf_search(
                q, c, p, rm, ls, ll, k=K, nprobe=nprobe, cap=index.cap,
                overflow_start=index.overflow_start,
                overflow_len=index.overflow_len,
                query_chunk=min(LOW_Q, chunk),
            ),
            ivf_ops, LOW_Q, d,
        )
        emit(
            f"ivf_nprobe{nprobe}", qps, "queries/s",
            recall_at_10=round(rec, 4),
            speedup_vs_flat=round(qps / flat_qps, 2),
            backend=backend,
        )


if __name__ == "__main__":
    main()
