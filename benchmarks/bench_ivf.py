"""Config #3: IVF build (k-means on device) + nprobe sweep vs recall@10
(BASELINE.md). Runs at 200k on TPU (IVF targets low-batch latency; see
ARCHITECTURE.md §4), 20k on CPU."""

import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import device_corpus, emit

D, K = 256, 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = ensure_backend()
    n = 200_000 if backend == "tpu" else 20_000
    nlist = 512 if backend == "tpu" else 64
    from intool_rag_tpu.index.ivf_index import IVFFlatIndex
    from intool_rag_tpu.ops.topk import flat_topk

    corpus = device_corpus(n, D, dtype="float32")
    t0 = time.perf_counter()
    index = IVFFlatIndex.build(corpus, nlist=nlist, iters=8)
    build_s = time.perf_counter() - t0
    emit(f"ivf_build_seconds_{n//1000}k_nlist{nlist}", build_s, "s", backend=backend)

    queries = corpus[:64] + 0.05 * jax.random.normal(jax.random.PRNGKey(9), (64, D))
    _, exact_rows = flat_topk(queries, corpus, K, metric="ip", block_n=min(50_000, n))
    exact = [set(r.tolist()) for r in np.asarray(exact_rows)]

    for nprobe in (1, 4, 16, 64):
        if nprobe > nlist:
            continue
        t0 = time.perf_counter()
        _, rows = index.search(queries, K, nprobe=nprobe)
        rows_np = np.asarray(rows)
        dt = time.perf_counter() - t0
        rec = sum(len(exact[i] & set(r.tolist())) for i, r in enumerate(rows_np)) / (64 * K)
        emit(
            f"ivf_recall10_nprobe{nprobe}", rec, "recall",
            latency_ms_64q=round(dt * 1000, 1), backend=backend,
        )


if __name__ == "__main__":
    main()
