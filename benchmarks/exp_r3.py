"""Round-3 kernel experiments: decompose dense + BM25 stage time at the
1M×d1024 operating point to find the real limiter before optimizing.

Dense: kernel-only vs tail vs rescore; a matmul-only kernel variant
(no argmax bookkeeping) to bound the VPU tail cost; packed val+idx
variant. BM25: gather vs sort vs segmented-sum; packed single-i32 sort.

Usage: PYTHONPATH=. python benchmarks/exp_r3.py [dense|bm25]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def stream_time(fn, rotate_inputs, *consts, reps: int = 3) -> float:
    """Pipelined lax.scan stream; min-of-reps wall time per batch."""
    import jax

    @jax.jit
    def stream(consts, batched):
        def step(_, inp):
            args = inp if isinstance(inp, tuple) else (inp,)
            return None, fn(*args, *consts)

        _, out = jax.lax.scan(step, None, batched)
        return out

    np.asarray(jax.tree.leaves(stream(consts, rotate_inputs[-1]))[0])
    times = []
    for inp in rotate_inputs[:reps]:
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(stream(consts, inp))[0])
        times.append(time.perf_counter() - t0)
    g = jax.tree.leaves(rotate_inputs[0])[0].shape[0]
    return min(times) / g


def dense_experiments():
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from intool_rag_tpu.ops.flat_pallas import flat_topk_pallas
    from intool_rag_tpu.ops.topk import rescore_candidates

    n, dim, q, g = (1_000_000, 1024, 256, 16) if backend == "tpu" else (
        100_000, 256, 64, 2)
    n = -(-n // 8192) * 8192

    @jax.jit
    def gen_corpus():
        c = jax.random.normal(jax.random.PRNGKey(7), (n, dim), jnp.float32)
        return (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(jnp.bfloat16)

    corpus = gen_corpus()
    make_q = jax.jit(lambda k: jax.random.normal(k, (g, q, dim), jnp.float32))
    dqs = [make_q(jax.random.PRNGKey(i + 1)) for i in range(4)]
    out = {"backend": backend, "n": n}

    # ---- current default path ----
    out["full_default_ms"] = 1e3 * stream_time(
        lambda dq, c: flat_topk_pallas(dq, c, 100, group_l=16, valid_n=n)[0],
        dqs, corpus)

    # ---- matmul-only kernel (no argmax/iota bookkeeping) ----
    out["matmul_only_ms"] = 1e3 * stream_time(
        lambda dq, c: _matmul_only(dq, c), dqs, corpus)

    # ---- matmul-only with bigger blocks via D-tiling ----
    for bn, dt in ((4096, 512), (8192, 256), (8192, 512)):
        try:
            out[f"matmul_dtile_b{bn}_d{dt}_ms"] = 1e3 * stream_time(
                lambda dq, c, bn=bn, dt=dt: _matmul_dtiled(dq, c, bn, dt),
                dqs, corpus)
        except Exception as e:  # noqa: BLE001
            out[f"matmul_dtile_b{bn}_d{dt}_ms"] = f"ERR {type(e).__name__}: {e}"[:120]

    # ---- packed val+idx kernel (bit-packed argmax, 1 reduce) ----
    for bn, gl, dt in ((2048, 16, 0), (4096, 32, 512), (8192, 64, 256), (8192, 64, 512)):
        try:
            out[f"packed_b{bn}_g{gl}_d{dt}_ms"] = 1e3 * stream_time(
                lambda dq, c, bn=bn, gl=gl, dt=dt: _packed_kernel(
                    dq, c, bn, gl, dt, n)[0],
                dqs, corpus)
        except Exception as e:  # noqa: BLE001
            out[f"packed_b{bn}_g{gl}_d{dt}_ms"] = f"ERR {type(e).__name__}: {e}"[:120]

    # ---- rescore alone ----
    rows = jnp.asarray(
        np.random.default_rng(0).integers(0, n, (g, q, 100)).astype(np.int32))
    rows_rot = [(rows + i) % n for i in range(4)]
    out["rescore_ms"] = 1e3 * stream_time(
        lambda dq, r, c: rescore_candidates(dq, c, r, metric="cosine"),
        [(d, r) for d, r in zip(dqs, rows_rot)], corpus)
    print(json.dumps(out, indent=1))


def _matmul_only(dq, c):
    """Pure score-stream kernel: matmul + per-block max only (bounds the
    achievable HBM/MXU rate with zero selection bookkeeping)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = c.shape
    block_n = 2048
    q = dq.shape[0]

    def kern(q_ref, c_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, :] = jnp.max(s.reshape(q, block_n // 128, 128), axis=1)

    out = pl.pallas_call(
        kern,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, (n // block_n) * 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d, bytes_accessed=n * d * 2, transcendentals=0),
    )(dq.astype(c.dtype), c)
    return out[:, ::64].sum()  # tiny fetch


def _matmul_dtiled(dq, c, block_n, d_tile):
    """Matmul-only with D-tiled accumulation: corpus block [block_n, d_tile]
    per grid step, f32 accumulator scratch, reduce on last D step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = c.shape
    q = dq.shape[0]
    nd = d // d_tile

    def kern(q_ref, c_ref, o_ref, acc):
        di = pl.program_id(1)

        @pl.when(di == 0)
        def _init():
            acc[:, :] = jnp.zeros_like(acc)

        acc[:, :] += jax.lax.dot_general(
            q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(di == nd - 1)
        def _out():
            o_ref[:, :] = jnp.max(
                acc[:, :].reshape(q, block_n // 128, 128), axis=1)

    out = pl.pallas_call(
        kern,
        grid=(n // block_n, nd),
        in_specs=[
            pl.BlockSpec((q, d_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 128), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, (n // block_n) * 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((q, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d, bytes_accessed=n * d * 2, transcendentals=0),
    )(dq.astype(c.dtype), c)
    return out[:, ::64].sum()


def _packed_kernel(dq, c, block_n, group_l, d_tile, valid_n):
    """Full top-k path with bit-packed score+index single max-reduce.

    Positive-monotone trick: s' = s + 2 > 0, bitcast to i32 is monotone,
    low 6 bits carry the sublane group index (score perturbation ≤ 2^-17
    relative — far below bf16 matmul noise). One max reduce replaces
    max + compare + masked-min."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = c.shape
    q = dq.shape[0]
    lw = block_n // group_l
    nd = max(d // d_tile, 1) if d_tile else 1
    dt = d // nd

    def kern(q_ref, c_ref, vals_ref, idx_ref, acc):
        bi = pl.program_id(0)
        di = pl.program_id(1)

        @pl.when(di == 0)
        def _init():
            acc[:, :] = jnp.zeros_like(acc)

        acc[:, :] += jax.lax.dot_general(
            q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(di == nd - 1)
        def _out():
            s = acc[:, :] + 2.0
            bits = pltpu.bitcast(s, jnp.int32)
            j = jax.lax.broadcasted_iota(jnp.int32, (q, group_l, lw), 1)
            packed = (bits.reshape(q, group_l, lw) & ~jnp.int32(63)) | j
            m = jnp.max(packed, axis=1)
            vals_ref[:, :] = pltpu.bitcast(m & ~jnp.int32(63), jnp.float32) - 2.0
            base = bi * block_n
            lane = jax.lax.broadcasted_iota(jnp.int32, (q, lw), 1)
            idx_ref[:, :] = base + (m & 63) * lw + lane

    vals, idx = pl.pallas_call(
        kern,
        grid=(n // block_n, nd),
        in_specs=[
            pl.BlockSpec((q, dt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, dt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, lw), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, lw), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, (n // block_n) * lw), jnp.float32),
            jax.ShapeDtypeStruct((q, (n // block_n) * lw), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((q, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d, bytes_accessed=n * d * 2, transcendentals=0),
    )(dq.astype(c.dtype), c)
    vals, idx = jax.lax.optimization_barrier((vals, idx))
    tv, tp = jax.lax.approx_max_k(vals, 100, recall_target=0.999)
    return tv, jnp.take_along_axis(idx, tp, axis=-1)


def bm25_experiments():
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from bench import effective_sizes, make_sparse
    from intool_rag_tpu.ops.bm25 import bm25_topk_sorted

    n, vocab, p_max = effective_sizes(backend)
    rng = np.random.default_rng(0)
    starts, lens, post_docs, post_w, idf, qterms, qtf = make_sparse(
        rng, n, vocab, p_max)
    dev = [jnp.asarray(x) for x in (starts, lens, post_docs, post_w, idf)]
    qtf_d = jnp.asarray(qtf)
    g = 16 if backend == "tpu" else 2
    sqs = [
        jnp.asarray((qterms[None].repeat(g, 0) + 31 * i) % vocab)
        for i in range(4)
    ]
    out = {"backend": backend, "n": n, "p_max": p_max, "T": qterms.shape[1]}

    def gather_only(qt, ts, tl, pd, pw, idf_):
        qq, t = qt.shape

        def gather_one(terms_row, qtf_row):
            def per_term(term, q_tf):
                valid = term >= 0
                t_safe = jnp.maximum(term, 0)
                start = ts[t_safe]
                length = jnp.minimum(tl[t_safe], p_max)
                docs = jax.lax.dynamic_slice(pd, (start,), (p_max,))
                w = jax.lax.dynamic_slice(pw, (start,), (p_max,))
                pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
                mask = (pos < length) & valid
                contrib = jnp.where(mask, w * idf_[t_safe] * q_tf, 0.0)
                docs = jnp.where(mask, docs, n)
                return docs, contrib

            docs, contrib = jax.vmap(per_term)(terms_row, qtf_row)
            return docs.reshape(-1), contrib.reshape(-1)

        docs, contrib = jax.vmap(gather_one)(qt, qtf_d)
        return docs.sum() + contrib.sum()

    out["gather_only_ms"] = 1e3 * stream_time(
        lambda qt, *c: gather_only(qt, *c), sqs, *dev)

    def gather_sort(qt, ts, tl, pd, pw, idf_):
        qq, t = qt.shape

        def gather_one(terms_row, qtf_row):
            def per_term(term, q_tf):
                t_safe = jnp.maximum(term, 0)
                start = ts[t_safe]
                length = jnp.minimum(tl[t_safe], p_max)
                docs = jax.lax.dynamic_slice(pd, (start,), (p_max,))
                w = jax.lax.dynamic_slice(pw, (start,), (p_max,))
                pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
                mask = (pos < length) & (term >= 0)
                contrib = jnp.where(mask, w * idf_[t_safe] * q_tf, 0.0)
                docs = jnp.where(mask, docs, n)
                return docs, contrib

            docs, contrib = jax.vmap(per_term)(terms_row, qtf_row)
            return docs.reshape(-1), contrib.reshape(-1)

        docs, contrib = jax.vmap(gather_one)(qt, qtf_d)
        ds, cs = jax.lax.sort_key_val(docs, contrib, dimension=1)
        return ds.sum() + cs.sum()

    out["gather_sort_ms"] = 1e3 * stream_time(
        lambda qt, *c: gather_sort(qt, *c), sqs, *dev)

    out["full_sorted_ms"] = 1e3 * stream_time(
        lambda qt, *c: bm25_topk_sorted(
            qt, qtf_d, *c, 100, n_docs=n, p_max=p_max)[0],
        sqs, *dev)

    from intool_rag_tpu.ops.bm25 import bm25_topk_packed

    out["full_packed_ms"] = 1e3 * stream_time(
        lambda qt, *c: bm25_topk_packed(
            qt, qtf_d, *c, 100, n_docs=n, p_max=p_max)[0],
        sqs, *dev)

    # agreement check packed vs sorted
    sv, sr = bm25_topk_sorted(sqs[0][0], qtf_d, *dev, 100, n_docs=n, p_max=p_max)
    pv, pr = bm25_topk_packed(sqs[0][0], qtf_d, *dev, 100, n_docs=n, p_max=p_max)
    inter = np.mean([
        len(set(np.asarray(sr)[i, :10]) & set(np.asarray(pr)[i, :10])) / 10
        for i in range(sr.shape[0])
    ])
    out["packed_top10_overlap"] = round(float(inter), 4)
    print(json.dumps(out, indent=1))


def gather_experiments():
    """Compare the vmapped-dynamic-slice postings gather (current) with a
    2-D aligned row-gather layout [n_terms, p_max]."""
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from bench import effective_sizes, make_sparse

    n, vocab, p_max = effective_sizes(backend)
    rng = np.random.default_rng(0)
    starts, lens, post_docs, post_w, idf, qterms, qtf = make_sparse(
        rng, n, vocab, p_max)
    g = 16 if backend == "tpu" else 2
    sqs = [
        jnp.asarray((qterms[None].repeat(g, 0) + 31 * i) % vocab)
        for i in range(4)
    ]
    out = {"backend": backend, "n": n, "p_max": p_max, "T": qterms.shape[1]}

    # build the 2-D layout on host: every term one padded row
    nnz = int(lens.sum())
    rows2d_docs = np.full((vocab, p_max), n, np.int32)
    rows2d_w = np.zeros((vocab, p_max), np.float32)
    for t in range(vocab):
        l = lens[t]
        if l:
            s0 = starts[t]
            rows2d_docs[t, :l] = post_docs[s0:s0+l]
            rows2d_w[t, :l] = post_w[s0:s0+l]
    d2_docs = jnp.asarray(rows2d_docs)
    d2_w = jnp.asarray(rows2d_w)
    idf_d = jnp.asarray(idf)
    qtf_d = jnp.asarray(qtf)
    starts_d = jnp.asarray(starts)
    lens_d = jnp.asarray(lens)
    pd_d = jnp.asarray(post_docs)
    pw_d = jnp.asarray(post_w)
    out["bytes_2d_mb"] = round((rows2d_docs.nbytes + rows2d_w.nbytes) / 1e6, 1)
    out["bytes_1d_mb"] = round((post_docs.nbytes + post_w.nbytes) / 1e6, 1)

    def gather_1d(qt, starts_d, lens_d, pd_d, pw_d, idf_d):
        def gather_one(terms_row, qtf_row):
            def per_term(term, q_tf):
                t_safe = jnp.maximum(term, 0)
                start = starts_d[t_safe]
                length = jnp.minimum(lens_d[t_safe], p_max)
                docs = jax.lax.dynamic_slice(pd_d, (start,), (p_max,))
                w = jax.lax.dynamic_slice(pw_d, (start,), (p_max,))
                pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
                mask = (pos < length) & (term >= 0)
                contrib = jnp.where(mask, w * idf_d[t_safe] * q_tf, 0.0)
                docs = jnp.where(mask, docs, n)
                return docs, contrib
            docs, contrib = jax.vmap(per_term)(terms_row, qtf_row)
            return docs.reshape(-1), contrib.reshape(-1)
        docs, contrib = jax.vmap(gather_one)(qt, qtf_d)
        return docs.sum() + contrib.sum()

    out["gather_1d_ms"] = 1e3 * stream_time(
        gather_1d, sqs, starts_d, lens_d, pd_d, pw_d, idf_d)

    def gather_2d(qt, dd, dw, idf_):
        t_safe = jnp.maximum(qt, 0)
        docs = dd[t_safe]          # [Q, T, p_max] row gather
        w = dw[t_safe]
        contrib = w * (idf_[t_safe] * qtf_d)[:, :, None]
        docs = jnp.where((qt >= 0)[:, :, None], docs, n)
        return docs.sum() + contrib.sum()

    out["gather_2d_ms"] = 1e3 * stream_time(gather_2d, sqs, d2_docs, d2_w, idf_d)

    def gather_2d_take(qt, dd, dw):
        t_safe = jnp.maximum(qt, 0).reshape(-1)
        docs = jnp.take(dd, t_safe, axis=0)
        w = jnp.take(dw, t_safe, axis=0)
        return docs.sum() + w.sum()

    out["gather_2d_take_ms"] = 1e3 * stream_time(gather_2d_take, sqs, d2_docs, d2_w)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dense"
    if which == "dense":
        dense_experiments()
    elif which == "gather":
        gather_experiments()
    else:
        bm25_experiments()
