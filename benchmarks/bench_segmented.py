"""Segmented binary-residual capacity point: 50M × d1024 rows on ONE
chip (ROADMAP #6 — the PQ-class scale, done TPU-style).

Streams 100 × 500k-row segments into a SegmentedResidualIndex
(bits=1: 0.125 byte/dim sign codes → ~6.4 GB codes + ~1.6 GB group
scales + ids ≈ 8.6 GB resident), then serves 256-query batches with an
nprobe sweep. The exact oracle REGENERATES corpus chunks from their
PRNG keys and streams exact f32 scores through a running top-k — no 200
GB raw corpus ever exists.

Pre-grows the store to the final segment count: capacity doubling's
transient (old + new store live during the copy) would exceed HBM at
this scale.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_segmented.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit

D = 1024
Q = 256
K = 10
N_CENTERS = 4096


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.index.segmented_residual import (
        SegmentedResidualIndex,
    )

    on_tpu = backend == "tpu"
    seg_rows = 500_000 if on_tpu else 4096
    n_segments = 100 if on_tpu else 4
    nlist = N_CENTERS if on_tpu else 64
    n = seg_rows * n_segments

    @jax.jit
    def gen_centers():
        c = jax.random.normal(jax.random.PRNGKey(0), (nlist, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers = gen_centers()

    # noise is calibrated per-dim so the TOTAL noise norm (≈ scale·√D)
    # is ~0.35 of the unit center norm — at d1024 a 0.35/dim scale would
    # give norm ~11 and the "clusters" would be uniform noise
    noise = 0.35 / float(np.sqrt(D))

    @jax.jit
    def gen_chunk(key, centers):
        """Clustered rows: center + per-row-radius noise, unit-normalized.
        Deterministic per key — the exact oracle regenerates these.

        The radius SPREAD (log-uniform 0.2–2× the base) is what makes
        recall well-defined: equal radii put every cluster member at the
        same distance from a query, so the "exact top-10" is an
        arbitrary pick among thousands of ties that no quantized code
        (int8 included) could reproduce. With spread, a query's true
        neighbors are its cluster's small-radius rows, separated by
        real score gaps — the regime actual embedding corpora live in."""
        k1, k2, k3 = jax.random.split(key, 3)
        ids = jax.random.randint(k1, (seg_rows,), 0, nlist)
        radius = noise * jnp.exp(
            jax.random.uniform(
                k3, (seg_rows, 1), minval=jnp.log(0.2), maxval=jnp.log(2.0)
            )
        )
        x = centers[ids] + radius * jax.random.normal(
            k2, (seg_rows, D), jnp.float32
        )
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    # ---- train on the first chunk ----
    first = gen_chunk(jax.random.PRNGKey(1), centers)
    t0 = time.perf_counter()
    index = SegmentedResidualIndex.train(
        first[: min(seg_rows, 500_000)], nlist=nlist, iters=8,
        seg_rows=seg_rows, bits=1,
    )
    jax.block_until_ready(index.centroids)
    t_train = time.perf_counter() - t0
    print(f"# k-means train: {t_train:.1f}s", file=sys.stderr)

    index._grow_to(n_segments)  # avoid the doubling transient at scale

    # ---- streaming appends ----
    t0 = time.perf_counter()
    for c in range(n_segments):
        chunk = gen_chunk(jax.random.PRNGKey(1 + c), centers)
        index.append(chunk)
        if c % 10 == 0:
            print(f"# appended segment {c}", file=sys.stderr)
    jax.block_until_ready(index._store[0])
    t_ingest = time.perf_counter() - t0
    rows_per_s = n / t_ingest
    gb = index.bytes_resident / 1e9
    print(
        f"# ingest {n} rows in {t_ingest:.1f}s ({rows_per_s:,.0f} rows/s), "
        f"{gb:.2f} GB resident",
        file=sys.stderr,
    )

    # ---- queries: perturbed copies of known rows ----
    @jax.jit
    def gen_queries(key, centers):
        src = gen_chunk(jax.random.PRNGKey(1 + 3), centers)[:Q]
        qn = src + (0.1 * noise) * jax.random.normal(
            key, (Q, D), jnp.float32
        )
        return qn / jnp.linalg.norm(qn, axis=1, keepdims=True)

    qs = [gen_queries(jax.random.PRNGKey(100 + i), centers) for i in range(4)]

    results = {}
    for nprobe in (4, 8, 16):
        if nprobe > nlist:
            continue
        np.asarray(index.search(qs[-1], K, nprobe=nprobe)[0])  # compile
        times = []
        for qv in qs[:3]:
            t0 = time.perf_counter()
            np.asarray(index.search(qv, K, nprobe=nprobe)[0])
            times.append(time.perf_counter() - t0)
        results[nprobe] = {
            "qps": round(Q / min(times), 1),
            "ms_per_batch": round(min(times) * 1000, 1),
        }

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

    bv = jnp.full((sub, K), -jnp.inf, jnp.float32)
    bi = jnp.full((sub, K), -1, jnp.int32)
    for c in range(n_segments):
        bv, bi = chunk_topk(
            bv, bi, jax.random.PRNGKey(1 + c), c * seg_rows, centers, q_sub
        )
    oracle = np.asarray(bi)

    recalls = {}
    pool_recalls = {}
    for nprobe in results:
        _, rows = index.search(q_sub, K, nprobe=nprobe)
        got = np.asarray(rows)
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(got, oracle)
        )
        recalls[nprobe] = round(hits / oracle.size, 4)
        # candidate recall@10-in-100: binary codes rank coarsely inside
        # tight clusters (by design — 1 bit of magnitude); the refine
        # tier rescoring the top-100 pool exactly recovers recall@10 =
        # THIS number (tests/test_segmented_residual.py proves the
        # rescore plumbing; this proves candidate quality at scale)
        _, rows100 = index.search(q_sub, 100, nprobe=nprobe)
        got100 = np.asarray(rows100)
        hits100 = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(got100, oracle)
        )
        pool_recalls[nprobe] = round(hits100 / oracle.size, 4)

    best = max(
        (p for p in results if pool_recalls[p] >= 0.95),
        default=max(results),
    )
    emit(
        f"segmented_binary_qps_{n}x{D}",
        results[best]["qps"],
        "queries/s",
        backend=backend,
        n_rows=n,
        bits=1,
        bytes_resident_gb=round(gb, 2),
        ingest_rows_per_s=round(rows_per_s, 1),
        train_s=round(t_train, 1),
        nprobe=best,
        sweep={
            str(p): {
                **results[p],
                "recall@10_raw": recalls[p],
                "recall@10_in_100": pool_recalls[p],
            }
            for p in results
        },
    )


if __name__ == "__main__":
    main()
