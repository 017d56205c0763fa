"""50M×d1024 capacity point on the list-major binary-residual index
(index/bits_index.py + the ops/bits_pallas.py probed-scan kernel).

Replaces the segment-store prototype's serving numbers (52 QPS / 0.31
pool recall at 50M, BENCH_NOTES round 3c): probed reads here are
contiguous block DMAs driven by scalar-prefetched offsets, and codes
dequantize in VMEM. The exact oracle REGENERATES corpus chunks from
their PRNG keys and streams exact f32 scores through a running top-k —
no 200 GB raw corpus ever exists. Recall is reported against both the
f32-exact and exact-int8 oracles (the refine tier scores in int8, so
rank-9/10 near-ties legitimately swap vs f32).

Corpus distribution (env ``BITS_DIST``): ``micro`` (default) has
micro-cluster (near-duplicate/paraphrase) structure — see
common.microcluster_chunk_fn; ``ties`` is the radius-spread near-tie
stress distribution whose in-cluster margins (~1e-4) sit BELOW the
rescoring noise of even an exact-int8 oracle — no quantized index can
rank it (measured decomposition: benchmarks/exp_bits_recall.py), so
its recall is reported for transparency, not as a target.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_bits.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit  # noqa: E402

D = 1024
Q = 256
K = 10
POOL = 100


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.index.bits_index import IVFBitsIndex

    on_tpu = backend == "tpu"
    # 250k-row chunks (not 500k): after the full 50M ingest the BFC
    # allocator is fragmented enough that a contiguous 2 GB f32 chunk
    # transient no longer fits (round 3e — two OOMs at the first
    # post-ingest gen with ~5 GB nominally free); 1 GB transients ride
    # through. Query sources are captured during ingest for the same
    # reason (no post-ingest regeneration).
    seg_rows = 250_000 if on_tpu else 4000  # % micro group == 0
    n_segments = 200 if on_tpu else 4
    nlist = 4096 if on_tpu else 64
    block_n = 1024 if on_tpu else 128
    n = seg_rows * n_segments
    capacity = int(1.06 * n)  # spill headroom; cap_l rounds to block_n

    @jax.jit
    def gen_centers():
        c = jax.random.normal(jax.random.PRNGKey(0), (nlist, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers = gen_centers()
    noise = 0.35 / float(np.sqrt(D))
    dist = os.environ.get("BITS_DIST", "micro")

    if dist == "micro":
        from common import microcluster_chunk_fn

        gen_chunk = jax.jit(microcluster_chunk_fn(seg_rows, D))
    else:

        @jax.jit
        def gen_chunk(key, centers):
            """Near-tie stress: radius-spread clusters (module docstring)."""
            k1, k2, k3 = jax.random.split(key, 3)
            ids = jax.random.randint(k1, (seg_rows,), 0, nlist)
            radius = noise * jnp.exp(
                jax.random.uniform(
                    k3, (seg_rows, 1), minval=jnp.log(0.2),
                    maxval=jnp.log(2.0),
                )
            )
            x = centers[ids] + radius * jax.random.normal(
                k2, (seg_rows, D), jnp.float32
            )
            return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    # ---- train on the first chunk ----
    first = gen_chunk(jax.random.PRNGKey(1), centers)
    t0 = time.perf_counter()
    # refine=False: the bench drives the host-tier copy itself with
    # copy_to_host_async (append()'s synchronous np.asarray fetch would
    # serialize ~20 s/chunk of tunnel time into the loop).
    index = IVFBitsIndex.train(
        first, nlist, capacity=capacity, block_n=block_n, iters=8,
        refine=False,
    )
    jax.block_until_ready(index.centroids)
    del first  # 2 GB f32 — keeping it through ingest OOMs the 9 GB store
    t_train = time.perf_counter() - t0
    print(f"# k-means train: {t_train:.1f}s", file=sys.stderr)

    # ---- streaming appends, refine tier fetched async alongside ----
    # The tier copy is tunnel-bound on axon (~25 MB/s measured → ~20
    # s/chunk for 512 MB of int8); `copy_to_host_async` overlaps it with
    # the next chunk's device work. On a real TPU host this copy rides
    # PCIe (and production ingest already HAS the rows in host RAM — the
    # embedding pipeline feeds append() from there), so the honest
    # device-side ingest rate is reported separately below.
    from intool_rag_tpu.ops.quant import quantize_int8

    quant8 = jax.jit(quantize_int8)
    pending: list = []

    def _collect_one() -> None:
        q8, s8 = pending.pop(0)
        index.host_int8.append(np.asarray(q8))
        index.host_scale8.append(np.asarray(s8, dtype=np.float32))

    t0 = time.perf_counter()
    t_device = 0.0
    q_src = None
    src_chunk = min(3, n_segments - 1)
    for c in range(n_segments):
        td = time.perf_counter()
        chunk = gen_chunk(jax.random.PRNGKey(1 + c), centers)
        index.append(chunk)
        if c == src_chunk:
            # query sources captured now — regenerating this chunk after
            # ingest needs a contiguous multi-GB transient that the
            # fragmented post-ingest allocator can't serve
            q_src = np.asarray(chunk[:Q])
        q8, s8 = quant8(chunk)
        jax.block_until_ready(q8)
        t_device += time.perf_counter() - td
        try:
            q8.copy_to_host_async()
            s8.copy_to_host_async()
        except Exception:
            pass
        pending.append((q8, s8))
        # free the 2 GB f32 chunk BEFORE the next gen (rebinding the
        # loop variable keeps old+new alive simultaneously: +2 GB that
        # OOMed the 9 GB-store + pending-int8 configuration), and keep
        # the async-fetch window at 1 in-flight chunk
        del chunk, q8, s8
        if len(pending) > 1:
            _collect_one()
        if c % 10 == 0:
            print(f"# appended chunk {c}", file=sys.stderr)
    while pending:
        _collect_one()
    index.refine = True
    index._host_cat = None
    t_ingest = time.perf_counter() - t0
    rows_per_s = n / t_ingest
    gb = index.bytes_resident / 1e9
    print(
        f"# ingest {n} rows in {t_ingest:.1f}s ({rows_per_s:,.0f} rows/s "
        f"tunnel-bound; device work {t_device:.1f}s = "
        f"{n / max(t_device, 1e-9):,.0f} rows/s), "
        f"{gb:.2f} GB HBM + {index.bytes_host / 1e9:.1f} GB host int8",
        file=sys.stderr,
    )

    # ---- queries: perturbed copies of known rows ----
    src_rows = jnp.asarray(q_src)  # captured during ingest (1 MB)

    @jax.jit
    def gen_queries(key, src_rows):
        qn = src_rows + (0.1 * noise) * jax.random.normal(
            key, (Q, D), jnp.float32
        )
        return qn / jnp.linalg.norm(qn, axis=1, keepdims=True)

    qs = [
        jax.block_until_ready(
            gen_queries(jax.random.PRNGKey(100 + i), src_rows)
        )
        for i in range(4)
    ]

    results = {}
    for nprobe in (8, 16, 32):
        if nprobe > index.nlist:
            continue
        np.asarray(
            index.search(qs[-1], K, nprobe=nprobe, refine_k=POOL)[0]
        )  # compile
        times = []
        for qv in qs[:3]:
            t0 = time.perf_counter()
            np.asarray(index.search(qv, K, nprobe=nprobe, refine_k=POOL)[0])
            times.append(time.perf_counter() - t0)
        results[nprobe] = {
            "qps": round(Q / min(times), 1),
            "ms_per_batch": round(min(times) * 1000, 1),
        }
        print(f"# nprobe {nprobe}: {results[nprobe]}", file=sys.stderr)

    # ---- exact oracle on a query subsample: stream regenerated chunks ----
    sub = 64
    q_sub = qs[0][:sub]

    @jax.jit
    def chunk_topk(best_v, best_i, key, base, centers, q_sub):
        chunk = gen_chunk(key, centers)
        sc = jax.lax.dot_general(
            q_sub, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, p = jax.lax.top_k(sc, K)
        mv = jnp.concatenate([best_v, v], axis=1)
        mi = jnp.concatenate([best_i, base + p], axis=1)
        v2, p2 = jax.lax.top_k(mv, K)
        return v2, jnp.take_along_axis(mi, p2, axis=1)

    # int8 oracle: same stream, int8-dequantized chunks (the refine
    # tier's precision class)
    @jax.jit
    def chunk_topk8(best_v, best_i, key, base, centers, q_sub):
        from intool_rag_tpu.ops.quant import dequantize_int8, quantize_int8

        chunk = dequantize_int8(*quantize_int8(gen_chunk(key, centers)))
        sc = jax.lax.dot_general(
            q_sub, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, p = jax.lax.top_k(sc, K)
        mv = jnp.concatenate([best_v, v], axis=1)
        mi = jnp.concatenate([best_i, base + p], axis=1)
        v2, p2 = jax.lax.top_k(mv, K)
        return v2, jnp.take_along_axis(mi, p2, axis=1)

    oracles = {}
    for name, fn in (("f32", chunk_topk), ("int8", chunk_topk8)):
        bv = jnp.full((sub, K), -jnp.inf, jnp.float32)
        bi = jnp.full((sub, K), -1, jnp.int32)
        for c in range(n_segments):
            bv, bi = fn(
                bv, bi, jax.random.PRNGKey(1 + c), c * seg_rows, centers,
                q_sub,
            )
        oracles[name] = np.asarray(bi)
        print(f"# oracle {name} done", file=sys.stderr)

    recalls = {}
    pool_recalls = {}
    for nprobe in results:
        _, rows = index.search(q_sub, K, nprobe=nprobe, refine_k=POOL)
        got = np.asarray(rows)
        for name, oracle in oracles.items():
            hits = sum(
                len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(got, oracle)
            )
            recalls.setdefault(nprobe, {})[name] = round(
                hits / oracle.size, 4
            )
        _, rows_pool = index.search(q_sub, POOL, nprobe=nprobe)
        got_pool = np.asarray(rows_pool)
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(got_pool, oracles["f32"])
        )
        pool_recalls[nprobe] = round(hits / oracles["f32"].size, 4)
        print(
            f"# nprobe {nprobe}: recall {recalls[nprobe]}, "
            f"pool@{POOL} {pool_recalls[nprobe]}",
            file=sys.stderr,
        )

    best = max(
        (p for p in results if recalls[p]["int8"] >= 0.9),
        default=max(results),
    )
    emit(
        f"bits_qps_{n}x{D}",
        results[best]["qps"],
        "queries/s",
        backend=backend,
        n_rows=n,
        bytes_hbm_gb=round(gb, 2),
        bytes_host_gb=round(index.bytes_host / 1e9, 2),
        ingest_rows_per_s=round(rows_per_s, 1),
        ingest_device_rows_per_s=round(n / max(t_device, 1e-9), 1),
        train_s=round(t_train, 1),
        nprobe=best,
        sweep={
            str(p): {
                **results[p],
                "recall@10_vs_f32": recalls[p]["f32"],
                "recall@10_vs_int8": recalls[p]["int8"],
                f"pool@{POOL}_vs_f32": pool_recalls[p],
            }
            for p in results
        },
    )


if __name__ == "__main__":
    main()
