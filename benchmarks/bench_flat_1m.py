"""Config #3-adjacent: dense flat search at 1M chunks × d1024 — exact vs
approx vs int8, pipelined throughput + recall (BASELINE.md)."""

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import device_corpus, device_queries, emit, timed_min

N, D, Q, G, K = 1_000_000, 1024, 256, 4, 100


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = ensure_backend()
    from intool_rag_tpu.ops.quant import flat_topk_int8, quantize_int8
    from intool_rag_tpu.ops.topk import flat_topk

    n = N if backend == "tpu" else 100_000
    cb = device_corpus(n, D)
    batches = device_queries(G, Q, D)

    def stream(search):
        @jax.jit
        def run(corpus_args, qall):
            def step(_, q):
                return None, search(q, corpus_args)

            _, out = jax.lax.scan(step, None, qall)
            return out

        return run

    # bf16 approx
    run = stream(lambda q, c: flat_topk(q, c, K, metric="ip", block_n=min(500_000, n), use_approx=True))
    dt = timed_min(lambda b: run(cb, b), batches) / G
    emit(f"dense_flat_qps_{n//1000}k_bf16_approx", Q / dt, "queries/s", backend=backend)

    # bf16 exact (blocked)
    run_ex = stream(lambda q, c: flat_topk(q, c, K, metric="ip", block_n=min(50_000, n)))
    dt_ex = timed_min(lambda b: run_ex(cb, b), batches) / G
    emit(f"dense_flat_qps_{n//1000}k_bf16_exact", Q / dt_ex, "queries/s", backend=backend)

    # int8
    cq, cs = jax.jit(lambda c: quantize_int8(c.astype(jnp.float32)))(cb)
    run_i8 = stream(lambda q, c: flat_topk_int8(q, c[0], c[1], K, block_n=min(250_000, n)))
    dt_i8 = timed_min(lambda b: run_i8((cq, cs), b), batches) / G
    emit(f"dense_flat_qps_{n//1000}k_int8", Q / dt_i8, "queries/s", backend=backend)

    # recall of approx vs exact on one batch
    q1 = batches[0][0][:32]
    _, re_ = flat_topk(q1, cb, 10, metric="ip", block_n=min(50_000, n))
    _, ra = flat_topk(q1, cb, 10, metric="ip", block_n=min(500_000, n), use_approx=True)
    ex = [set(r.tolist()) for r in np.asarray(re_)]
    rec = sum(len(ex[i] & set(r.tolist())) for i, r in enumerate(np.asarray(ra))) / 320
    emit(f"dense_flat_recall10_{n//1000}k_approx_vs_exact", rec, "recall")


if __name__ == "__main__":
    main()
