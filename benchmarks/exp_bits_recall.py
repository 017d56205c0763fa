"""Recall decomposition for the bits index at the 50M-point geometry.

The round-3c 50M measurement (BENCH_NOTES) showed the list-major bits
kernel serving at 2,193 QPS but recall@10 0.30 with pool@100 0.31 —
the candidate pool itself misses, flat across nprobe (the neighbors
all live in the query's home list; the loss is 1-bit IN-LIST ranking).

This experiment reproduces the geometry small (same ~12.2k rows/list,
same 13 blocks/list, same n_cand per query) at 3M rows so sweeps are
cheap, then measures pool recall vs (pool size, group_l, tail), the
binary-rank histogram of the true top-10, and refined recall/QPS at
candidate operating points.

Two distributions, env ``EXP_DIST``:

- ``micro`` (default): micro-cluster structure (common.py
  microcluster_chunk_fn) — true neighbors separated from their topic
  cluster by margins a quantizer can resolve. The distribution recall
  targets are set on.
- ``ties``: the original radius-spread clusters — 12k near-tied rows
  per list with margins ~1e-4, BELOW the rescoring noise of even an
  exact int8 oracle (measured: refined recall plateaus at 0.60 while
  pool recall reaches 0.95). Kept as the adversarial stress case; no
  quantized index of any kind can rank it, so it is not a recall
  target.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/exp_bits_recall.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend  # noqa: E402

D = 1024
Q = 256
K = 10
SUB = 64  # oracle query subsample


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.index.bits_index import IVFBitsIndex

    on_tpu = backend == "tpu"
    seg_rows = 500_000 if on_tpu else 8000  # % micro group (10) == 0
    n_segments = 6 if on_tpu else 2
    nlist = 256 if on_tpu else 8  # keeps rows/list ~12.2k like the 50M point
    block_n = 1024 if on_tpu else 128
    n = seg_rows * n_segments
    capacity = int(1.06 * n)

    @jax.jit
    def gen_centers():
        c = jax.random.normal(jax.random.PRNGKey(0), (nlist, D), jnp.float32)
        return c / jnp.linalg.norm(c, axis=1, keepdims=True)

    centers = gen_centers()
    noise = 0.35 / float(np.sqrt(D))

    dist = os.environ.get("EXP_DIST", "micro")  # micro | ties
    if dist == "micro":
        from common import microcluster_chunk_fn

        gen_chunk = jax.jit(microcluster_chunk_fn(seg_rows, D))
    else:

        @jax.jit
        def gen_chunk(key, centers):
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

    first = gen_chunk(jax.random.PRNGKey(1), centers)
    index = IVFBitsIndex.train(
        first, nlist, capacity=capacity, block_n=block_n, iters=8,
        refine=True,  # host int8 tier: the operating points refine
    )
    t0 = time.perf_counter()
    for c in range(n_segments):
        chunk = gen_chunk(jax.random.PRNGKey(1 + c), centers)
        index.append(chunk)
        del chunk
    print(
        f"# ingest {n} rows in {time.perf_counter() - t0:.1f}s, "
        f"blocks/list {index.blocks_per_list}",
        file=sys.stderr,
    )

    @jax.jit
    def gen_queries(key, centers):
        # source chunk must be one of the INGESTED chunks (keys
        # 1..n_segments) — a key outside that range makes queries
        # perturbations of rows that are not in the corpus
        src = gen_chunk(
            jax.random.PRNGKey(1 + min(3, n_segments - 1)), centers
        )[:Q]
        qn = src + (0.1 * noise) * jax.random.normal(key, (Q, D), jnp.float32)
        return qn / jnp.linalg.norm(qn, axis=1, keepdims=True)

    qs = gen_queries(jax.random.PRNGKey(100), centers)
    q_sub = qs[:SUB]

    # exact f32 oracle, streamed by regeneration
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

    bv = jnp.full((SUB, K), -jnp.inf, jnp.float32)
    bi = jnp.full((SUB, K), -1, jnp.int32)
    for c in range(n_segments):
        bv, bi = chunk_topk(
            bv, bi, jax.random.PRNGKey(1 + c), c * seg_rows, centers, q_sub
        )
    oracle = np.asarray(bi)
    print("# oracle done", file=sys.stderr)

    def pool_recall(got_rows: np.ndarray) -> float:
        hits = sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(got_rows, oracle)
        )
        return round(hits / oracle.size, 4)

    nprobe = 8
    if not on_tpu:
        pools = (100, 200)
        op_points = ((8, 100, "fold"), (2, 200, "blocked"))
    elif dist == "micro":
        pools = (20, 50, 100, 200, 400)
        op_points = (
            (8, 50, "fold"), (8, 100, "fold"), (8, 200, "fold"),
            (4, 100, "fold"), (2, 100, "fold"),
        )
    else:
        pools = (100, 200, 400, 800, 1600, 3200)
        op_points = (
            (8, 100, "fold"), (2, 800, "fold"), (2, 1600, "fold"),
            (2, 3200, "fold"), (2, 1600, "blocked"),
        )
    # --- pool-recall sweep: pool size x group_l ---
    for group_l in (8, 4, 2):
        line = []
        for pool in pools:
            _, rows = index.search(
                q_sub, pool, nprobe=nprobe, group_l=group_l
            )
            line.append((pool, pool_recall(np.asarray(rows))))
        print(
            f"# group_l={group_l}: "
            + " ".join(f"pool@{p}={r}" for p, r in line),
            file=sys.stderr, flush=True,
        )

    # --- operating points: refined recall@10 + QPS ---
    # Kernel work per query here is IDENTICAL to the 50M point (same
    # blocks/list x nprobe; only the trivial centroid matmul differs),
    # so these QPS numbers transfer within the refine tier's gather
    # scaling (the 50M tier gathers from 51 GB instead of 3 GB).
    qsets = [gen_queries(jax.random.PRNGKey(200 + i), centers)
             for i in range(3)]
    for group_l, pool, tail in op_points:
        np.asarray(index.search(
            qs, K, nprobe=nprobe, refine_k=pool, group_l=group_l, tail=tail,
        )[0])  # compile
        times = []
        for qv in qsets:
            t0 = time.perf_counter()
            np.asarray(index.search(
                qv, K, nprobe=nprobe, refine_k=pool, group_l=group_l,
                tail=tail,
            )[0])
            times.append(time.perf_counter() - t0)
        _, rows = index.search(
            q_sub, K, nprobe=nprobe, refine_k=pool, group_l=group_l,
            tail=tail,
        )
        rec = pool_recall(np.asarray(rows))
        print(
            f"# OP g{group_l} pool{pool} {tail}: recall@10={rec} "
            f"qps={Q / min(times):.0f} ms={min(times) * 1e3:.1f}",
            file=sys.stderr, flush=True,
        )

    # --- binary-rank histogram of the true top-10 at group_l=1-ish ---
    # (group_l=2 is the smallest the Mosaic output tile allows at
    # block_n=1024; rank positions of oracle rows inside a big pool)
    big = 1600 if on_tpu else 200
    _, rows = index.search(q_sub, big, nprobe=nprobe, group_l=2)
    rows = np.asarray(rows)
    ranks = []
    for a, b in zip(rows, oracle):
        pos = {int(r): i for i, r in enumerate(a.tolist())}
        ranks.extend(pos.get(int(t), big) for t in b.tolist())
    ranks = np.asarray(ranks)
    for edge in (10, 50, 100, 200, 400, 800, 1600):
        frac = float((ranks < edge).mean())
        print(f"# true-top10 binary-rank <{edge}: {frac:.3f}",
              file=sys.stderr)
    print(f"# not in pool@{big}: {float((ranks >= big).mean()):.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
