"""Pallas flat-kernel tuning sweep (round-3 verdict item 3: push the
dense kernel toward its roofline).

Roofline at Q=256, N=1M, D=1024 bf16 on v5e (197 bf16 TFLOP/s, ~819
GB/s HBM):

- HBM bound:   2.05 GB/pass → 2.5 ms/batch  → 102k QPS
- MXU bound:   1 matmul pass = 0.54 PFLOP/batch → 2.7 ms → ~94k QPS;
  the split-query precise path runs 2 passes → ~47k QPS ceiling.

So at the benchmark operating point the PRECISE kernel is compute-bound
(arithmetic intensity 512 FLOP/corpus-byte ≫ the ~240 ridge), and the
single-pass approx path sits right at the roofline knee. This sweep
times both across corpus block sizes — bigger blocks amortize grid
overhead and deepen DMA pipelining; the 48 MB scoped-VMEM cap
(ops/flat_pallas.py) admits block_n 8192 at D=1024.

Emits one JSON line per config with effective QPS, GB/s and %roofline.
"""

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import device_corpus, device_queries, emit, timed_min

D, Q, G, K = 1024, 256, 4, 100
N_PAD = 1_007_616  # 123·8192 — divisible by every swept block_n
N_VALID = 1_000_000


def main() -> None:
    import jax

    backend = ensure_backend()
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas

    if backend != "tpu":
        n_pad, n_valid = 98_304, 96_000  # 12·8192
    else:
        n_pad, n_valid = N_PAD, N_VALID
    corpus = device_corpus(n_pad, D)
    batches = device_queries(G, Q, D)

    def stream(block_n, precise, argmax_mode):
        @jax.jit
        def run(c, qall):
            def step(_, q):
                return None, flat_topk_pallas(
                    q, c, K, block_n=block_n, group_l=16,
                    valid_n=n_valid, precise=precise,
                    argmax_mode=argmax_mode,
                )

            _, out = jax.lax.scan(step, None, qall)
            return out

        return run

    passes = {False: 1, True: 2}
    for block_n in (2048, 4096, 8192):
        for precise in (False, True):
          for argmax_mode in ("maskmin", "argmax"):
            try:
                run = stream(block_n, precise, argmax_mode)
                dt = timed_min(lambda b: run(corpus, b), batches) / G
            except Exception as exc:  # VMEM OOM etc — report, keep sweeping
                emit(
                    f"flat_tune_b{block_n}_{'precise' if precise else 'approx'}_{argmax_mode}",
                    0.0, "queries/s", backend=backend,
                    error=str(exc)[:160],
                )
                continue
            qps = Q / dt
            gbs = n_valid * D * 2 / dt / 1e9
            mxu_ms = passes[precise] * 2 * Q * n_valid * D / 197e12 * 1e3
            hbm_ms = n_valid * D * 2 / 819e9 * 1e3
            roof_ms = max(mxu_ms, hbm_ms)
            emit(
                f"flat_tune_b{block_n}_{'precise' if precise else 'approx'}_{argmax_mode}",
                qps, "queries/s", backend=backend,
                ms_per_batch=round(dt * 1e3, 2),
                eff_gb_s=round(gbs, 1),
                pct_roofline=round(100 * roof_ms / (dt * 1e3), 1),
            )


if __name__ == "__main__":
    main()
