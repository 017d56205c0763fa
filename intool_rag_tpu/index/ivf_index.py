"""IVF (inverted-file) dense index: k-means partitioning + probe search.

The scale-out index of BASELINE.md config #3 (the reference only ever
builds exact ``IndexFlatL2`` — faiss_index.py:123). Layout is TPU-first:

- corpus rows are permuted so each list is contiguous in one padded
  device matrix; probing list ``l`` is a clamped ``dynamic_slice`` of
  ``cap`` rows from the permuted corpus + a length mask — static shapes,
  no ragged postings on device;
- lists longer than ``cap`` (k-means skew) spill their overflow rows into
  a shared *overflow tail* that every query also scans — recall never
  silently degrades, the cost is one extra slice;
- search: queries → centroid scores (one matmul) → top-nprobe lists →
  one batched gather of ``[Qc, nprobe·cap]`` candidate rows → one
  batched matmul → one top-k, processed in query chunks to bound the
  gathered working set. (Round 1 scanned probes per query with batch-1
  matvecs — MXU-hostile and slow to compile; this is three ops.)
  The shared overflow tail is scored once per chunk with a static slice.

When to use: single/low-batch query latency at large N. For full-batch
throughput the flat index's one-pass corpus read amortizes better (see
ARCHITECTURE.md discussion); both are exposed behind the same search API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans


class IVFFlatIndex:
    def __init__(
        self,
        centroids: jax.Array,  # [L, D] f32
        permuted: jax.Array,  # [M_pad, D] corpus rows grouped by list
        row_map: jax.Array,  # [M_pad] i32: permuted row -> original row (-1 pad)
        list_start: jax.Array,  # [L] i32 into permuted
        list_len: jax.Array,  # [L] i32
        overflow_start: int,
        overflow_len: int,
        cap: int,
    ) -> None:
        self.centroids = centroids
        self.permuted = permuted
        self.row_map = row_map
        self.list_start = list_start
        self.list_len = list_len
        self.overflow_start = overflow_start
        self.overflow_len = overflow_len
        self.cap = cap

    # ---------------- build ----------------

    @classmethod
    def build(
        cls,
        embeddings: jax.Array,  # [N, D] (valid rows only)
        nlist: int,
        *,
        iters: int = 10,
        cap_quantile: float = 0.98,
        seed: int = 0,
        dtype=None,
    ) -> "IVFFlatIndex":
        n, d = embeddings.shape
        nlist = min(nlist, max(1, n // 4))
        centroids, assign = kmeans(
            embeddings, nlist, iters=iters, seed=seed
        )
        # only the assignment vector (4 bytes/row) comes to host; the
        # corpus itself is permuted by a device-side gather below (a full
        # host fetch is minutes at 1M×1024 through the remote tunnel)
        assign_np = np.asarray(assign)

        counts = np.bincount(assign_np, minlength=nlist)
        cap = int(np.quantile(counts, cap_quantile)) + 1
        cap = max(8, -(-cap // 8) * 8)  # sublane-align

        main_rows: list[np.ndarray] = []
        overflow_rows: list[np.ndarray] = []
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
        overflow = np.concatenate(overflow_rows) if overflow_rows else np.zeros(0, np.int64)
        overflow_start = pos
        perm = np.concatenate(main_rows + [overflow]).astype(np.int64)
        m = len(perm)
        m_pad = max(8, -(-(m + cap) // 8) * 8)  # slack so slices never OOB
        out_dtype = dtype or embeddings.dtype
        perm_dev = jnp.asarray(perm.astype(np.int32))

        @jax.jit
        def place(emb):
            gathered = emb[perm_dev].astype(out_dtype)
            return jnp.zeros((m_pad, d), out_dtype).at[:m].set(gathered)

        permuted = place(embeddings)
        row_map = np.full(m_pad, -1, np.int32)
        row_map[:m] = perm
        return cls(
            centroids=centroids,
            permuted=permuted,
            row_map=jnp.asarray(row_map),
            list_start=jnp.asarray(list_start),
            list_len=jnp.asarray(list_len),
            overflow_start=overflow_start,
            overflow_len=int(len(overflow)),
            cap=cap,
        )

    # ---------------- search ----------------

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    def search(
        self, queries: jax.Array, k: int, *, nprobe: int = 8, query_chunk: int = 32
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (scores [Q, k] f32, original rows [Q, k] i32), MIPS."""
        nprobe = min(nprobe, self.nlist)
        return _ivf_search(
            queries,
            self.centroids,
            self.permuted,
            self.row_map,
            self.list_start,
            self.list_len,
            k=k,
            nprobe=nprobe,
            cap=self.cap,
            overflow_start=self.overflow_start,
            overflow_len=self.overflow_len,
            query_chunk=min(query_chunk, queries.shape[0]),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "cap", "overflow_start", "overflow_len", "query_chunk"
    ),
)
def _ivf_search(
    queries,
    centroids,
    permuted,
    row_map,
    list_start,
    list_len,
    *,
    k,
    nprobe,
    cap,
    overflow_start,
    overflow_len,
    query_chunk,
):
    from ..ops.topk import blocked_topk

    q, d = queries.shape
    qf = queries.astype(permuted.dtype)

    # 1. probe selection: one matmul against centroids
    c_scores = jax.lax.dot_general(
        queries.astype(jnp.float32),
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _, probes = jax.lax.top_k(c_scores, nprobe)  # [Q, nprobe]

    # shared overflow tail (static slice bounds — same rows for everyone)
    over_pad = -(-max(overflow_len, 1) // 8) * 8 if overflow_len else 0

    def chunk_body(carry, start):
        chunk_q = jax.lax.dynamic_slice(qf, (start, 0), (query_chunk, d))
        chunk_p = jax.lax.dynamic_slice(
            probes, (start, 0), (query_chunk, nprobe)
        )  # [Qc, P]
        # 2. one batched gather of every probed list's rows
        p_start = list_start[chunk_p]  # [Qc, P]
        p_len = list_len[chunk_p]  # [Qc, P]
        offs = p_start[:, :, None] + jnp.arange(cap, dtype=jnp.int32)  # [Qc,P,cap]
        offs = offs.reshape(query_chunk, nprobe * cap)
        cand = permuted[offs]  # [Qc, P·cap, d]
        ids = row_map[offs]  # [Qc, P·cap]
        in_len = (
            jnp.arange(cap, dtype=jnp.int32)[None, None, :] < p_len[:, :, None]
        ).reshape(query_chunk, nprobe * cap)
        # 3. one batched matmul + mask
        scores = jnp.einsum(
            "qnd,qd->qn", cand.astype(jnp.float32), chunk_q.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST
            if permuted.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT,
        )
        scores = jnp.where(in_len & (ids >= 0), scores, -jnp.inf)
        if over_pad:
            oblock = jax.lax.dynamic_slice(
                permuted, (overflow_start, 0), (over_pad, d)
            )
            oids = jax.lax.dynamic_slice(row_map, (overflow_start,), (over_pad,))
            oscores = jax.lax.dot_general(
                chunk_q.astype(jnp.float32), oblock.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            opos = jnp.arange(over_pad, dtype=jnp.int32)
            oscores = jnp.where(
                (opos < overflow_len) & (oids >= 0), oscores, -jnp.inf
            )
            scores = jnp.concatenate([scores, oscores], axis=1)
            ids = jnp.concatenate(
                [ids, jnp.broadcast_to(oids, (query_chunk, over_pad))], axis=1
            )
        # 4. one top-k over the candidate pool
        vals, pos = blocked_topk(scores, k, block=1024)
        rows = jnp.take_along_axis(ids, pos, axis=1)
        rows = jnp.where(jnp.isfinite(vals), rows, -1)
        return carry, (vals, rows)

    q_pad = -(-q // query_chunk) * query_chunk
    if q_pad != q:
        qf = jnp.pad(qf, ((0, q_pad - q), (0, 0)))
        probes = jnp.pad(probes, ((0, q_pad - q), (0, 0)))
    starts = jnp.arange(0, q_pad, query_chunk)
    _, (vals, rows) = jax.lax.scan(chunk_body, None, starts)
    vals = vals.reshape(q_pad, k)[:q]
    rows = rows.reshape(q_pad, k)[:q]
    return vals, rows
