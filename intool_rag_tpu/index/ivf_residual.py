"""IVF with int4-residual encoding: the >10M-rows-per-chip index.

ROADMAP #7 / round-2 verdict item 5b: the 10M×d1024 corpus fits one v5e
chip at int8 (10.2 GB); growing past that needs a smaller per-row code.
This is the residual-encoding design done TPU-first:

- IVF k-means removes most of each vector's energy; the RESIDUAL
  ``r = x − centroid(list(x))`` has ~2-4× smaller dynamic range, so
  4-bit symmetric quantization of r loses about as much as 8-bit on the
  raw vector. Two int4 codes pack per byte → 0.5 byte/dim: 10M×1024
  = 5.1 GB resident, double int8's capacity per chip.
- Classic LUT-PQ (256-entry codebooks + per-byte table lookups) is a
  GATHER workload — the exact op family TPUs do worst (round-3
  measurements: element gathers run ~100× below HBM speed). Int4
  residual decode is shift/mask/multiply — pure VPU — and the score is
  one bf16 matmul against the dequantized block: every hot op lands on
  MXU/VPU at full tile width.
- Scoring is exact-decomposed: ``q·x = q·c_list + q·r``; the first term
  falls out of the (already computed) centroid probe scores, the second
  from the int4 residual matmul.

Layout mirrors :class:`IVFFlatIndex` (contiguous permuted lists, capped
with a shared overflow tail, clamped dynamic-slice probing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans


GROUP = 128  # dims per quantization group (one scale per group)


def encode_int4_residuals(residuals: jax.Array):
    """Group-wise symmetric int4 quantization, packed two codes/uint8.

    Returns (packed [N, D/2] uint8, scales [N, D/GROUP] f32). One scale
    per 128-dim group instead of per row: a single outlier dim then only
    inflates its own group's step (measured ~2× lower reconstruction
    error on gaussian residuals). Codes are in [-7, 7]; packing is (low
    nibble = even dim, high nibble = odd dim), offset +8 so nibbles are
    non-negative."""
    n, d = residuals.shape
    g = max(d // GROUP, 1)
    r = residuals.astype(jnp.float32).reshape(n, g, -1)
    absmax = jnp.max(jnp.abs(r), axis=2)  # [N, G]
    scale = jnp.maximum(absmax, 1e-9) / 7.0
    q = jnp.clip(jnp.round(r / scale[:, :, None]), -7, 7)
    q = q.reshape(n, d).astype(jnp.int32) + 8
    lo = q[:, 0::2]
    hi = q[:, 1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def decode_int4(packed: jax.Array) -> jax.Array:
    """[..., D/2] uint8 → [..., D] f32 codes in [-7, 7]."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p >> 4) - 8
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1).astype(
        jnp.float32
    )


def dequantize_int4(packed: jax.Array, scales: jax.Array) -> jax.Array:
    """(packed [N, D/2], scales [N, G]) → residuals [N, D] f32."""
    codes = decode_int4(packed)
    n, d = codes.shape
    g = scales.shape[1]
    return (codes.reshape(n, g, -1) * scales[:, :, None]).reshape(n, d)


def encode_int1_residuals(residuals: jax.Array):
    """Binary (sign) residual codes, 8 per byte — the TPU answer to PQ.

    Classic product quantization reaches 0.125-0.06 byte/dim with
    256-entry codebook LUT lookups — a gather workload TPUs run ~100×
    below HBM speed. Sign quantization reaches the same 0.125 byte/dim
    with shift/mask decode (pure VPU) and one matmul to score, and the
    per-group scale ``mean(|r|)`` is the MSE-optimal reconstruction
    level for a sign code (argmin_s E[(r − s·sign r)²] = E|r|).
    Intra-list ranking degrades more than int4 (1 bit of magnitude is
    gone); deployments recover it with the host-DRAM int8 refine tier
    (``build(refine=True)`` + ``refine_k``) exactly as PQ deployments
    re-rank with stored full vectors.

    Returns (packed [N, D/8] uint8 — bit j of byte b = sign of dim
    8b+j, 1 = non-negative; scales [N, D/GROUP] f32)."""
    n, d = residuals.shape
    g = max(d // GROUP, 1)
    r = residuals.astype(jnp.float32).reshape(n, g, -1)
    scale = jnp.maximum(jnp.mean(jnp.abs(r), axis=2), 1e-9)  # [N, G]
    bits = (residuals.reshape(n, d // 8, 8) >= 0).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
    packed = jnp.sum(bits * weights, axis=2).astype(jnp.uint8)
    return packed, scale


def decode_int1(packed: jax.Array) -> jax.Array:
    """[..., D/8] uint8 → [..., D] f32 codes in {−1, +1}."""
    p = packed.astype(jnp.int32)[..., None]  # [..., D/8, 1]
    j = jnp.arange(8, dtype=jnp.int32)
    bits = (p >> j) & 1  # [..., D/8, 8]
    return (bits * 2 - 1).reshape(*packed.shape[:-1], -1).astype(jnp.float32)


def dequantize_int1(packed: jax.Array, scales: jax.Array) -> jax.Array:
    """(packed [N, D/8], scales [N, G]) → reconstructed residuals
    ``scale · sign(r)`` [N, D] f32."""
    codes = decode_int1(packed)
    n, d = codes.shape
    g = scales.shape[1]
    return (codes.reshape(n, g, -1) * scales[:, :, None]).reshape(n, d)


class IVFResidualIndex:
    """IVF + packed int4 residual codes (capacity-oriented index)."""

    def __init__(
        self,
        centroids: jax.Array,  # [L, D] f32
        codes: jax.Array,  # [M_pad, D/2] uint8 permuted by list
        scales: jax.Array,  # [M_pad] f32
        row_list: jax.Array,  # [M_pad] i32: permuted row -> its list id
        row_map: jax.Array,  # [M_pad] i32: permuted row -> original row
        list_start: jax.Array,
        list_len: jax.Array,
        overflow_start: int,
        overflow_len: int,
        cap: int,
        bits: int = 4,
    ) -> None:
        self.centroids = centroids
        self.codes = codes
        self.scales = scales
        self.row_list = row_list
        self.row_map = row_map
        self.list_start = list_start
        self.list_len = list_len
        self.overflow_start = overflow_start
        self.overflow_len = overflow_len
        self.cap = cap
        self.bits = bits  # 4 (int4 codes) or 1 (sign codes, D/8 bytes/row)
        # optional host-DRAM int8 refinement tier (ROADMAP #7): HBM holds
        # the int4 capacity codes; deployments with host memory to spare
        # keep a per-row int8 copy THERE and exactly rescore the tiny
        # top-k′ candidate pool on the host — recovering int8-grade
        # intra-cluster ranking at zero extra HBM.
        self.host_int8: "np.ndarray | None" = None
        self.host_scale8: "np.ndarray | None" = None

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def bytes_resident(self) -> int:
        return int(self.codes.size + self.scales.size * 4
                   + self.centroids.size * 4 + self.row_map.size * 8)

    # ---------------- build ----------------

    @classmethod
    def build(
        cls,
        embeddings: jax.Array,  # [N, D], D even
        nlist: int,
        *,
        iters: int = 10,
        cap_quantile: float = 0.98,
        seed: int = 0,
        refine: bool = False,
        bits: int = 4,
    ) -> "IVFResidualIndex":
        n, d = embeddings.shape
        if bits not in (4, 1):
            raise ValueError(f"bits must be 4 or 1, got {bits}")
        if bits == 4 and d % 2:
            raise ValueError("int4 packing needs even D")
        if bits == 1 and d % 8:
            raise ValueError("binary packing needs D divisible by 8")
        nlist = min(nlist, max(1, n // 4))
        centroids, assign = kmeans(embeddings, nlist, iters=iters, seed=seed)
        assign_np = np.asarray(assign)

        counts = np.bincount(assign_np, minlength=nlist)
        cap = int(np.quantile(counts, cap_quantile)) + 1
        cap = max(8, -(-cap // 8) * 8)

        main_rows, overflow_rows = [], []
        list_start = np.zeros(nlist, np.int32)
        list_len = np.zeros(nlist, np.int32)
        pos = 0
        order = np.argsort(assign_np, kind="stable")
        bounds = np.searchsorted(assign_np[order], np.arange(nlist + 1))
        for l in range(nlist):
            rows = order[bounds[l] : bounds[l + 1]]
            keep, spill = rows[:cap], rows[cap:]
            list_start[l] = pos
            list_len[l] = len(keep)
            main_rows.append(keep)
            overflow_rows.append(spill)
            pos += len(keep)
        overflow = (
            np.concatenate(overflow_rows) if overflow_rows else np.zeros(0, np.int64)
        )
        overflow_start = pos
        perm = np.concatenate(main_rows + [overflow]).astype(np.int64)
        m = len(perm)
        m_pad = max(8, -(-(m + cap) // 8) * 8)
        perm_dev = jnp.asarray(perm.astype(np.int32))
        assign_dev = jnp.asarray(assign_np.astype(np.int32))

        encode = encode_int4_residuals if bits == 4 else encode_int1_residuals
        code_width = d // 2 if bits == 4 else d // 8

        @jax.jit
        def place(emb, cents):
            gathered = emb[perm_dev].astype(jnp.float32)
            lists = assign_dev[perm_dev]
            resid = gathered - cents[lists]
            packed, scale = encode(resid)
            codes = jnp.zeros((m_pad, code_width), jnp.uint8).at[:m].set(packed)
            scales = jnp.zeros(
                (m_pad, scale.shape[1]), jnp.float32
            ).at[:m].set(scale)
            return codes, scales, lists

        codes, scales, lists = place(embeddings, centroids)
        row_map = np.full(m_pad, -1, np.int32)
        row_map[:m] = perm
        row_list = np.zeros(m_pad, np.int32)
        row_list[:m] = assign_np[perm]
        idx = cls(
            centroids=centroids,
            codes=codes,
            scales=scales,
            row_list=jnp.asarray(row_list),
            row_map=jnp.asarray(row_map),
            list_start=jnp.asarray(list_start),
            list_len=jnp.asarray(list_len),
            overflow_start=overflow_start,
            overflow_len=int(len(overflow)),
            cap=cap,
            bits=bits,
        )
        if refine:
            from ..ops.quant import quantize_int8

            codes8, scales8 = jax.jit(quantize_int8)(embeddings)
            idx.host_int8 = np.asarray(codes8)
            idx.host_scale8 = np.asarray(scales8, dtype=np.float32)
        return idx

    @property
    def bytes_host(self) -> int:
        """Host-DRAM footprint of the optional int8 refinement tier."""
        if self.host_int8 is None:
            return 0
        return int(self.host_int8.nbytes + self.host_scale8.nbytes)

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
        """(scores [Q, k] f32, original rows [Q, k] i32), MIPS.

        With ``refine_k`` and a host int8 tier (``build(refine=True)``),
        the device pass retrieves ``max(k, refine_k)`` candidates by
        int4-residual score and the host exactly rescores that pool
        against the int8 rows — the returned top-k ranking then matches
        the int8 index wherever the candidate pool covers it."""
        nprobe = min(nprobe, self.nlist)
        do_refine = refine_k and self.host_int8 is not None
        k_dev = max(k, refine_k) if do_refine else k
        vals, rows = _ivf_residual_search(
            queries, self.centroids, self.codes, self.scales,
            self.row_list, self.row_map, self.list_start, self.list_len,
            k=k_dev, nprobe=nprobe, cap=self.cap,
            overflow_start=self.overflow_start,
            overflow_len=self.overflow_len,
            query_chunk=min(query_chunk, queries.shape[0]),
            bits=self.bits,
        )
        if not do_refine:
            return vals, rows
        rows_np = np.asarray(rows)
        q_np = np.asarray(queries, dtype=np.float32)
        safe = np.maximum(rows_np, 0)
        cand = self.host_int8[safe].astype(np.float32)  # [Q, k', D]
        scale = self.host_scale8[safe]  # [Q, k']
        exact = np.einsum("qkd,qd->qk", cand, q_np) * scale
        exact = np.where(rows_np >= 0, exact, -np.inf)
        order = np.argsort(-exact, axis=1)[:, :k]
        out_vals = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        out_rows = np.take_along_axis(rows_np, order, axis=1)
        out_rows = np.where(np.isfinite(out_vals), out_rows, -1)
        return jnp.asarray(out_vals), jnp.asarray(out_rows)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "cap", "overflow_start", "overflow_len",
        "query_chunk", "bits",
    ),
)
def _ivf_residual_search(
    queries, centroids, codes, scales, row_list, row_map,
    list_start, list_len,
    *, k, nprobe, cap, overflow_start, overflow_len, query_chunk,
    bits=4,
):
    from ..ops.topk import blocked_topk

    q, d = queries.shape
    qf = queries.astype(jnp.float32)

    c_scores = jax.lax.dot_general(
        qf, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, L]
    _, probes = jax.lax.top_k(c_scores, nprobe)

    over_pad = -(-max(overflow_len, 1) // 8) * 8 if overflow_len else 0

    def score_rows(chunk_q, chunk_cs, offs, valid):
        """Score permuted rows ``offs [Qc, R]``: q·c_list + q·r̂."""
        qc = chunk_q.shape[0]
        code_rows = codes[offs.reshape(-1)]  # [Qc·R, D/bits-width] row gather
        dequant = dequantize_int4 if bits == 4 else dequantize_int1
        r = dequant(code_rows, scales[offs.reshape(-1)])
        r = r.reshape(qc, -1, d)
        res_scores = jnp.einsum(
            "qnd,qd->qn", r, chunk_q, preferred_element_type=jnp.float32
        )
        cent_part = jnp.take_along_axis(
            chunk_cs, row_list[offs.reshape(qc, -1)], axis=1
        )
        return jnp.where(valid, cent_part + res_scores, -jnp.inf)

    def chunk_body(carry, start):
        chunk_q = jax.lax.dynamic_slice(qf, (start, 0), (query_chunk, d))
        chunk_p = jax.lax.dynamic_slice(
            probes, (start, 0), (query_chunk, nprobe)
        )
        chunk_cs = jax.lax.dynamic_slice(
            c_scores, (start, 0), (query_chunk, c_scores.shape[1])
        )
        p_start = list_start[chunk_p]
        p_len = list_len[chunk_p]
        offs = p_start[:, :, None] + jnp.arange(cap, dtype=jnp.int32)
        offs = offs.reshape(query_chunk, nprobe * cap)
        ids = row_map[offs]
        in_len = (
            jnp.arange(cap, dtype=jnp.int32)[None, None, :] < p_len[:, :, None]
        ).reshape(query_chunk, nprobe * cap)
        scores = score_rows(chunk_q, chunk_cs, offs, in_len & (ids >= 0))
        if over_pad:
            ooffs = overflow_start + jnp.arange(over_pad, dtype=jnp.int32)
            ooffs = jnp.broadcast_to(ooffs, (query_chunk, over_pad))
            oids = row_map[ooffs]
            ovalid = (
                jnp.arange(over_pad, dtype=jnp.int32)[None, :] < overflow_len
            ) & (oids >= 0)
            oscores = score_rows(chunk_q, chunk_cs, ooffs, ovalid)
            scores = jnp.concatenate([scores, oscores], axis=1)
            ids = jnp.concatenate([ids, oids], axis=1)
        vals, pos = blocked_topk(scores, k, block=1024)
        rows = jnp.take_along_axis(ids, pos, axis=1)
        rows = jnp.where(jnp.isfinite(vals), rows, -1)
        return carry, (vals, rows)

    q_pad = -(-q // query_chunk) * query_chunk
    if q_pad != q:
        qf = jnp.pad(qf, ((0, q_pad - q), (0, 0)))
        probes = jnp.pad(probes, ((0, q_pad - q), (0, 0)))
        c_scores = jnp.pad(c_scores, ((0, q_pad - q), (0, 0)))
    starts = jnp.arange(0, q_pad, query_chunk)
    _, (vals, rows) = jax.lax.scan(chunk_body, None, starts)
    return vals.reshape(q_pad, k)[:q], rows.reshape(q_pad, k)[:q]
