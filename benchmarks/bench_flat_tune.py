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

    # ---- int8 / int8r sweep: int8 corpus blocks are half the bytes of
    # bf16, so block_n 8192 fits the double-buffer comfortably; the
    # residual config adds the corpus q2 plane (3rd matmul). group_l 64
    # requires block_n % (128·64): only 8192 qualifies in this sweep.
    if backend != "tpu":
        return
    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas_int8
    from intool_rag_tpu.ops.quant import quantize_int8_residual

    q1, q2, s8 = jax.jit(quantize_int8_residual)(corpus)
    jax.block_until_ready(q1)

    def stream_i8(block_n, group_l, residual):
        @jax.jit
        def run(c1, c2, cs, qall):
            def step(_, q):
                return None, flat_topk_pallas_int8(
                    q, c1, cs, K, corpus_res=c2 if residual else None,
                    block_n=block_n, group_l=group_l, valid_n=n_valid,
                    tail="fold",
                )

            _, out = jax.lax.scan(step, None, qall)
            return out

        return run

    for block_n, group_l in ((4096, 32), (8192, 32), (8192, 64)):
        for residual in (False, True):
            name = (
                f"flat_tune_int8{'r' if residual else ''}_b{block_n}_g{group_l}"
            )
            try:
                run = stream_i8(block_n, group_l, residual)
                dt = timed_min(lambda b: run(q1, q2, s8, b), batches) / G
            except Exception as exc:
                emit(name, 0.0, "queries/s", backend=backend,
                     error=str(exc)[:160])
                continue
            n_mm = 3 if residual else 2
            corpus_bytes = n_valid * D * (2 if residual else 1)
            emit(
                name, Q / dt, "queries/s", backend=backend,
                ms_per_batch=round(dt * 1e3, 2),
                eff_gb_s=round(corpus_bytes / dt / 1e9, 1),
                # int8 MXU at 2× the bf16 MAC rate (394 TOP/s class)
                pct_roofline=round(
                    100
                    * max(
                        n_mm * 2 * Q * n_valid * D / 394e12 * 1e3,
                        corpus_bytes / 819e9 * 1e3,
                    )
                    / (dt * 1e3),
                    1,
                ),
            )


if __name__ == "__main__":
    main()
