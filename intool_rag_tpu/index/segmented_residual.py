"""Streaming segmented residual index: the 50M-rows-per-chip ingest path.

ROADMAP #6 (PQ-class capacity) meets the streaming-ingest requirement of
BASELINE config #5: :class:`IVFResidualIndex` needs the whole corpus up
front (global list permutation), so growing a capacity index by stream
would re-encode everything per batch. This index instead appends
Lucene-style SEGMENTS — fixed-shape encoded chunks that share one
trained centroid set:

- ``train()`` runs k-means once on a sample (the reference trains FAISS
  IVF the same way: rag/storage/faiss_index.py trains on the first
  batch); appends never retrain.
- ``append(embeddings)`` encodes ONE new segment on device: assign to
  centroids, sort locally by list, cap per-list postings with a shared
  per-segment overflow tail, quantize residuals (int4 or binary sign
  codes — 0.5 / 0.125 byte per dim). All segments have identical shapes,
  so they stack on a leading axis; storage doubles geometrically with
  donated ``dynamic_update_slice`` (no per-append reallocation of the
  full store — the same lesson as benchmarks/bench_10m_int8.py).
- ``search()`` probes the SAME nprobe lists in every segment (shared
  centroids) and folds segments with one ``lax.scan`` carrying a running
  top-k — one compiled program per power-of-two segment capacity, not
  per segment count.

Scoring is the exact decomposition ``q·x = q·c_list + q·r̂`` of
:mod:`.ivf_residual`; the optional host-DRAM int8 tier exactly rescores
the candidate pool for final ranking (capacity in HBM, precision from
host DRAM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans
from .ivf_residual import (
    encode_int1_residuals,
    encode_int4_residuals,
    dequantize_int1,
    dequantize_int4,
)


def _pow2_at_least(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


class SegmentedResidualIndex:
    """Append-only capacity index over shared-centroid encoded segments."""

    def __init__(
        self,
        centroids: jax.Array,  # [L, D] f32, from train()
        *,
        seg_rows: int = 500_000,
        cap: int | None = None,
        bits: int = 4,
        refine: bool = False,
    ) -> None:
        if bits not in (4, 1):
            raise ValueError(f"bits must be 4 or 1, got {bits}")
        l, d = centroids.shape
        if bits == 4 and d % 2:
            raise ValueError("int4 packing needs even D")
        if bits == 1 and d % 8:
            raise ValueError("binary packing needs D divisible by 8")
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.seg_rows = int(seg_rows)
        self.bits = bits
        self.refine = refine
        # static per-list probe width: 4x the balanced load absorbs most
        # k-means skew; the per-segment overflow tail catches the rest
        # exactly (no row is ever dropped)
        self.cap = int(cap) if cap else max(8, 4 * -(-seg_rows // l))
        self.cap = -(-self.cap // 8) * 8
        self._w = d // 2 if bits == 4 else d // 8
        self._g = max(d // 128, 1)
        # the main region is COMPACTED (sum of per-list capped lengths),
        # so overflow rows reuse the free space right after it:
        # main_total + n_overflow ≤ seg_rows always — NO row is ever
        # dropped, whatever the skew. The last +8 slack row is the
        # write-dump slot for padding rows (gid −1).
        self._s_pad = self.seg_rows + 8
        # static width of the search's overflow scan: tracks the max
        # observed per-segment overflow (one scalar fetch per append);
        # recompiles only when the skew regime crosses a power of two
        self.max_overflow = 0
        self.n_segments = 0
        self.total_rows = 0
        self._store = None  # stacked device arrays, capacity-doubled
        self.host_int8: list[np.ndarray] = []
        self.host_scale8: list[np.ndarray] = []
        self._host_cat = None  # cached concat of the refine tier

    # ---------------- train ----------------

    @classmethod
    def train(
        cls,
        sample: jax.Array,  # [S, D] representative sample
        nlist: int,
        *,
        iters: int = 10,
        seed: int = 0,
        **kwargs,
    ) -> "SegmentedResidualIndex":
        nlist = min(nlist, max(1, sample.shape[0] // 4))
        centroids, _ = kmeans(sample, nlist, iters=iters, seed=seed)
        return cls(centroids, **kwargs)

    # ---------------- append ----------------

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def bytes_resident(self) -> int:
        if self._store is None:
            return int(self.centroids.size * 4)
        codes, scales, row_list, row_map, list_start, list_len, over_len = (
            self._store
        )
        return int(
            codes.size + scales.size * 4 + row_list.size * 4
            + row_map.size * 4 + list_start.size * 4 + list_len.size * 4
            + self.centroids.size * 4
        )

    def _alloc(self, n_seg_cap: int):
        l = self.nlist
        return (
            jnp.zeros((n_seg_cap, self._s_pad, self._w), jnp.uint8),
            jnp.zeros((n_seg_cap, self._s_pad, self._g), jnp.float32),
            jnp.zeros((n_seg_cap, self._s_pad), jnp.int32),
            jnp.full((n_seg_cap, self._s_pad), -1, jnp.int32),
            jnp.zeros((n_seg_cap, l), jnp.int32),
            jnp.zeros((n_seg_cap, l), jnp.int32),
            jnp.zeros((n_seg_cap,), jnp.int32),
        )

    def _grow_to(self, n_seg_cap: int) -> None:
        new = self._alloc(n_seg_cap)
        if self._store is not None:
            old = self._store

            @jax.jit
            def copy(new, old):
                return tuple(
                    jax.lax.dynamic_update_slice(n, o, (0,) * n.ndim)
                    for n, o in zip(new, old)
                )

            new = copy(new, old)
        self._store = new

    def append(self, embeddings: jax.Array) -> np.ndarray:
        """Encode one segment; returns the global row ids assigned
        (``total_rows_before + arange(n)``). ``embeddings`` may have up
        to ``seg_rows`` rows; shorter chunks pad internally."""
        n, d = embeddings.shape
        if n > self.seg_rows:
            raise ValueError(
                f"chunk of {n} rows exceeds seg_rows={self.seg_rows}; split it"
            )
        cap_now = self._store[0].shape[0] if self._store is not None else 0
        if self.n_segments + 1 > cap_now:
            self._grow_to(_pow2_at_least(self.n_segments + 1))
        base = self.total_rows
        seg = _encode_segment(
            jnp.asarray(embeddings), self.centroids,
            seg_rows=self.seg_rows, s_pad=self._s_pad,
            cap=self.cap, bits=self.bits,
            base_gid=base,
        )
        self.max_overflow = max(self.max_overflow, int(seg[-1]))
        self._store = _write_segment(self._store, seg, self.n_segments)
        self.n_segments += 1
        self.total_rows += n
        if self.refine:
            from ..ops.quant import quantize_int8

            codes8, scales8 = jax.jit(quantize_int8)(
                jnp.asarray(embeddings)
            )
            self.host_int8.append(np.asarray(codes8))
            self.host_scale8.append(np.asarray(scales8, dtype=np.float32))
            self._host_cat = None  # invalidate the cached concat
        return np.arange(base, base + n, dtype=np.int64)

    @property
    def bytes_host(self) -> int:
        return int(
            sum(a.nbytes for a in self.host_int8)
            + sum(a.nbytes for a in self.host_scale8)
        )

    # ---------------- search ----------------

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        nprobe: int = 8,
        query_chunk: int = 32,
        refine_k: int | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """(scores [Q, k] f32, global row ids [Q, k] i32, -1 empty), MIPS."""
        if self.n_segments == 0:
            q = queries.shape[0]
            return (
                jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32),
            )
        nprobe = min(nprobe, self.nlist)
        do_refine = refine_k and self.host_int8
        k_dev = max(k, refine_k) if do_refine else k
        # scan length = pow2 capacity ≥ n_segments: one compiled program
        # per doubling, masked segments contribute -inf
        # pow2 keeps recompiles logarithmic; clamp to the allocated
        # store so a pre-grown exact capacity never over-scans
        n_scan = min(
            _pow2_at_least(self.n_segments), self._store[0].shape[0]
        )
        tail_w = min(
            _pow2_at_least(max(self.max_overflow, 8)), self._s_pad
        )
        vals, rows = _segmented_search(
            queries, self.centroids, *self._store,
            k=k_dev, nprobe=nprobe, cap=self.cap,
            n_scan=n_scan, n_segments=self.n_segments,
            tail_w=tail_w, bits=self.bits,
            query_chunk=min(query_chunk, queries.shape[0]),
        )
        if not do_refine:
            return vals, rows
        # concat of the refine tier is invariant between appends — at the
        # 50M operating point it is ~51 GB, so rebuilding it per query
        # batch would cost seconds of memcpy and a 2x host-RAM transient
        # (review finding); cache and invalidate on append
        if self._host_cat is None:
            self._host_cat = (
                np.concatenate(self.host_int8),
                np.concatenate(self.host_scale8),
            )
        host8, hscale = self._host_cat
        rows_np = np.asarray(rows)
        q_np = np.asarray(queries, dtype=np.float32)
        safe = np.clip(rows_np, 0, len(host8) - 1)
        cand = host8[safe].astype(np.float32)
        scale = hscale[safe]
        exact = np.einsum("qkd,qd->qk", cand, q_np) * scale
        exact = np.where(rows_np >= 0, exact, -np.inf)
        order = np.argsort(-exact, axis=1)[:, :k]
        out_vals = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        out_rows = np.take_along_axis(rows_np, order, axis=1)
        out_rows = np.where(np.isfinite(out_vals), out_rows, -1)
        return jnp.asarray(out_vals), jnp.asarray(out_rows)


@functools.partial(
    jax.jit,
    static_argnames=("seg_rows", "s_pad", "cap", "bits"),
)
def _encode_segment(
    embeddings, centroids, *, seg_rows, s_pad, cap, bits,
    base_gid,
):
    """Assign → sort by list → cap with overflow tail → encode. Returns
    per-segment arrays shaped for the stacked store."""
    n, d = embeddings.shape
    l = centroids.shape[0]
    emb = embeddings.astype(jnp.float32)
    # BLOCKWISE assignment: the full [n, L] score matrix is 8.2 GB at
    # the 500k×4096 bench point — argmax per 32k-row block keeps the
    # transient under 0.6 GB (scan reuses the buffer)
    blk = 32_768
    n_pad_a = -(-n // blk) * blk
    emb_a = (
        jnp.pad(emb, ((0, n_pad_a - n), (0, 0))) if n_pad_a != n else emb
    )

    def assign_blk(_, rows):
        sc = jax.lax.dot_general(
            rows, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmax(sc, axis=1).astype(jnp.int32)

    _, assign_b = jax.lax.scan(
        assign_blk, None, emb_a.reshape(n_pad_a // blk, blk, d)
    )
    assign = assign_b.reshape(-1)[:n]  # [n]

    # pad to seg_rows with sentinel list id L (sorts last, maps to -1)
    pad = seg_rows - n
    assign_p = jnp.concatenate([assign, jnp.full((pad,), l, jnp.int32)])
    gids = jnp.concatenate(
        [
            base_gid + jnp.arange(n, dtype=jnp.int32),
            jnp.full((pad,), -1, jnp.int32),
        ]
    )
    order = jnp.argsort(assign_p, stable=True)
    sorted_list = assign_p[order]
    sorted_gid = gids[order]

    # per-list offsets via searchsorted over the sorted list ids
    list_start_all = jnp.searchsorted(
        sorted_list, jnp.arange(l + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = jnp.diff(list_start_all)  # [L]
    list_len = jnp.minimum(counts, cap)

    # main slot for row i (position rank within its list, capped) —
    # overflow rows go to the tail region in arrival order
    rank = jnp.arange(seg_rows, dtype=jnp.int32) - list_start_all[
        jnp.minimum(sorted_list, l - 1)
    ]
    is_pad = sorted_list >= l
    in_main = (rank < cap) & ~is_pad
    # compacted main region: start of list l = cumsum of capped counts
    main_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(list_len).astype(jnp.int32)]
    )
    main_pos = main_start[jnp.minimum(sorted_list, l - 1)] + rank
    over_rank = jnp.cumsum((~in_main & ~is_pad).astype(jnp.int32)) - 1
    # overflow reuses the free space right after the compacted main
    # region: main_total + over_rank < seg_rows always (no drops)
    main_total = main_start[-1]
    over_pos = main_total + over_rank
    pos = jnp.where(in_main, main_pos, jnp.where(is_pad, s_pad - 1, over_pos))
    pos = jnp.clip(pos, 0, s_pad - 1)
    keep_gid = jnp.where(is_pad, -1, sorted_gid)

    # BLOCKWISE residual encode: gathering the sorted rows, the centroid
    # rows, and the residuals each materialize [seg_rows, D] f32 (3 × 2
    # GB at the 500k×d1024 bench point — on top of the ~8.4 GB store
    # that's an OOM). Quantization is per-row (no cross-row stats), so a
    # scan over 32k-row blocks bounds the transients at ~0.4 GB; only
    # the tiny packed codes + scales come out.
    encode = encode_int4_residuals if bits == 4 else encode_int1_residuals
    blk_e = min(blk, seg_rows)
    n_pad_e = -(-seg_rows // blk_e) * blk_e
    ord_e = jnp.pad(order, (0, n_pad_e - seg_rows)) % jnp.maximum(n, 1)
    lst_e = jnp.pad(
        jnp.minimum(sorted_list, l - 1), (0, n_pad_e - seg_rows)
    )
    pad_e = jnp.pad(is_pad, (0, n_pad_e - seg_rows), constant_values=True)

    def enc_blk(_, inp):
        idx_b, lst_b, pad_b = inp
        rows = jnp.where(pad_b[:, None], 0.0, emb[idx_b])
        resid_b = rows - centroids[lst_b]
        return None, encode(resid_b)

    _, (packed_b, scale_b) = jax.lax.scan(
        enc_blk, None,
        (
            ord_e.reshape(-1, blk_e),
            lst_e.reshape(-1, blk_e),
            pad_e.reshape(-1, blk_e),
        ),
    )
    packed = packed_b.reshape(n_pad_e, -1)[:seg_rows]
    scale = scale_b.reshape(n_pad_e, -1)[:seg_rows]

    w = packed.shape[1]
    g = scale.shape[1]
    seg_codes = jnp.zeros((s_pad, w), jnp.uint8).at[pos].set(
        jnp.where(is_pad[:, None], 0, packed), mode="drop"
    )
    seg_scales = jnp.zeros((s_pad, g), jnp.float32).at[pos].set(
        scale, mode="drop"
    )
    seg_list = jnp.zeros((s_pad,), jnp.int32).at[pos].set(
        jnp.minimum(sorted_list, l - 1), mode="drop"
    )
    seg_gid = jnp.full((s_pad,), -1, jnp.int32).at[pos].set(
        keep_gid, mode="drop"
    )
    over_len = jnp.sum((~in_main & ~is_pad).astype(jnp.int32))
    return (
        seg_codes, seg_scales, seg_list, seg_gid,
        main_start[:-1], list_len, over_len,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_segment(store, seg, idx):
    return tuple(
        jax.lax.dynamic_update_slice(
            buf, new[None], (idx,) + (0,) * (buf.ndim - 1)
        )
        for buf, new in zip(store, seg)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "cap", "n_scan", "n_segments",
        "tail_w", "bits", "query_chunk",
    ),
)
def _segmented_search(
    queries, centroids, codes, scales, row_list, row_map,
    list_start, list_len, over_len,
    *, k, nprobe, cap, n_scan, n_segments, tail_w, bits,
    query_chunk,
):
    from ..ops.topk import blocked_topk

    q, d = queries.shape
    qf = queries.astype(jnp.float32)
    dequant = dequantize_int4 if bits == 4 else dequantize_int1

    c_scores = jax.lax.dot_general(
        qf, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, L]
    _, probes = jax.lax.top_k(c_scores, nprobe)


    def chunk_body(_, start):
        chunk_q = jax.lax.dynamic_slice(qf, (start, 0), (query_chunk, d))
        chunk_p = jax.lax.dynamic_slice(
            probes, (start, 0), (query_chunk, nprobe)
        )
        chunk_cs = jax.lax.dynamic_slice(
            c_scores, (start, 0), (query_chunk, c_scores.shape[1])
        )

        def seg_body(carry, c):
            best_v, best_r = carry
            s_codes = codes[c]  # [S_pad, W]
            s_scales = scales[c]
            s_list = row_list[c]
            s_gid = row_map[c]
            s_start = list_start[c]
            s_len = list_len[c]
            s_over = over_len[c]

            p_start = s_start[chunk_p]  # [Qc, nprobe]
            p_len = s_len[chunk_p]
            offs = p_start[:, :, None] + jnp.arange(cap, dtype=jnp.int32)
            offs = offs.reshape(query_chunk, nprobe * cap)
            in_len = (
                jnp.arange(cap, dtype=jnp.int32)[None, None, :]
                < p_len[:, :, None]
            ).reshape(query_chunk, nprobe * cap)
            # overflow region (right after the compacted main region),
            # shared by all queries of the chunk
            over_start = jnp.sum(s_len)
            ooffs = over_start + jnp.arange(tail_w, dtype=jnp.int32)
            ooffs = jnp.broadcast_to(ooffs, (query_chunk, tail_w))
            ovalid = jnp.broadcast_to(
                jnp.arange(tail_w, dtype=jnp.int32)[None, :] < s_over,
                (query_chunk, tail_w),
            )
            all_offs = jnp.clip(
                jnp.concatenate([offs, ooffs], axis=1),
                0, s_codes.shape[0] - 1,
            )
            all_valid = jnp.concatenate([in_len, ovalid], axis=1)
            flat = all_offs.reshape(-1)
            gids = s_gid[all_offs]
            all_valid = all_valid & (gids >= 0) & (c < n_segments)

            r = dequant(s_codes[flat], s_scales[flat]).reshape(
                query_chunk, -1, d
            )
            res_scores = jnp.einsum(
                "qnd,qd->qn", r, chunk_q, preferred_element_type=jnp.float32
            )
            cent_part = jnp.take_along_axis(
                chunk_cs, s_list[all_offs.reshape(query_chunk, -1)], axis=1
            )
            sc = jnp.where(all_valid, cent_part + res_scores, -jnp.inf)

            # fold into the running top-k
            merged_v = jnp.concatenate([best_v, sc], axis=1)
            merged_r = jnp.concatenate([best_r, gids], axis=1)
            vals, pos = blocked_topk(merged_v, k, block=1024)
            rows = jnp.take_along_axis(merged_r, pos, axis=1)
            return (vals, rows), None

        init = (
            jnp.full((query_chunk, k), -jnp.inf, jnp.float32),
            jnp.full((query_chunk, k), -1, jnp.int32),
        )
        (vals, rows), _ = jax.lax.scan(
            seg_body, init, jnp.arange(n_scan, dtype=jnp.int32)
        )
        rows = jnp.where(jnp.isfinite(vals), rows, -1)
        return None, (vals, rows)

    q_pad = -(-q // query_chunk) * query_chunk
    if q_pad != q:
        qf = jnp.pad(qf, ((0, q_pad - q), (0, 0)))
        probes = jnp.pad(probes, ((0, q_pad - q), (0, 0)))
        c_scores = jnp.pad(c_scores, ((0, q_pad - q), (0, 0)))
    starts = jnp.arange(0, q_pad, query_chunk)
    _, (vals, rows) = jax.lax.scan(chunk_body, None, starts)
    return vals.reshape(q_pad, k)[:q], rows.reshape(q_pad, k)[:q]


# ---------------- persistence ----------------
# At capacity scale (50M rows ≈ 8.6 GB) a restart must not re-encode the
# stream; segments persist as one npz (uncompressed: codes are already
# high-entropy packed bits) + a json sidecar — the same quartet pattern
# as storage/artifacts.py / BM25Index.save. Only live segments are
# written; load pre-allocates exactly that many (no doubling slack).


def _seg_save(self, path) -> None:
    import json
    from pathlib import Path

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = self.n_segments
    arrays = {"centroids": np.asarray(self.centroids)}
    names = (
        "codes", "scales", "row_list", "row_map", "list_start",
        "list_len", "over_len",
    )
    if n:
        for name, buf in zip(names, self._store):
            arrays[name] = np.asarray(buf[:n])
    for i, a in enumerate(self.host_int8):
        arrays[f"host_int8_{i}"] = a
        arrays[f"host_scale8_{i}"] = self.host_scale8[i]
    np.savez(path, **arrays)
    meta = {
        "seg_rows": self.seg_rows,
        "cap": self.cap,
        "bits": self.bits,
        "refine": self.refine,
        "n_segments": n,
        "total_rows": self.total_rows,
        "max_overflow": self.max_overflow,
        "n_host": len(self.host_int8),
    }
    Path(str(path) + ".meta.json").write_text(
        json.dumps(meta), encoding="utf-8"
    )


@classmethod
def _seg_load(cls, path) -> "SegmentedResidualIndex":
    import json
    from pathlib import Path

    path = Path(path)
    arrays = np.load(
        str(path) if str(path).endswith(".npz") else f"{path}.npz"
    )
    meta = json.loads(
        Path(str(path) + ".meta.json").read_text(encoding="utf-8")
    )
    index = cls(
        jnp.asarray(arrays["centroids"]),
        seg_rows=meta["seg_rows"], cap=meta["cap"], bits=meta["bits"],
        refine=meta["refine"],
    )
    n = meta["n_segments"]
    if n:
        names = (
            "codes", "scales", "row_list", "row_map", "list_start",
            "list_len", "over_len",
        )
        index._store = tuple(jnp.asarray(arrays[k]) for k in names)
    index.n_segments = n
    index.total_rows = meta["total_rows"]
    index.max_overflow = meta["max_overflow"]
    index.host_int8 = [
        arrays[f"host_int8_{i}"] for i in range(meta["n_host"])
    ]
    index.host_scale8 = [
        arrays[f"host_scale8_{i}"] for i in range(meta["n_host"])
    ]
    return index


SegmentedResidualIndex.save = _seg_save
SegmentedResidualIndex.load = _seg_load
