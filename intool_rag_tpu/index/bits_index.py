"""List-major binary-residual capacity index (the 50M-rows/chip tier).

Parity role: the IVF-PQ capacity class FAISS would provide the
reference (which itself stops at ``IndexFlatL2``,
rag/storage/faiss_index.py:106-128) — a new first-class component per
SURVEY §7.2#7, designed TPU-first. Supersedes the segment-store
prototype (``segmented_residual.py``) for SERVING: the round-3c TPU
measurement of that prototype at 50M rows showed per-row gathers plus
HBM dequantization caps it at ~52 QPS (BENCH_NOTES round 3c) — this
index keeps probed reads contiguous and dequantizes in VMEM
(ops/bits_pallas.py).

Layout: one global store where IVF list ``l`` owns the contiguous,
block-aligned slot range ``[l·cap_l, (l+1)·cap_l)``:

- ``codes [N_cap, D/8] u8`` — planar-packed residual signs,
- ``scales [N_cap/block_n, 8, block_n] f32`` — per-plane gains,
  block-major so the kernel's dynamic probe offset rides the leading
  dim; ``scales[:, 0, :] = -1`` marks an empty slot (``-inf``
  in-kernel),
- ``gid [N_cap] i32`` — slot → global row id (−1 empty).

Streaming appends assign each row to its nearest centroid WITH FREE
SPACE (spilling to the 2nd/3rd/4th choice under skew): because search
scans whole lists and scores by the exact decomposition
``q·x ≈ q·c_stored_list + q·r̂``, a spilled row is still scored
correctly — spill costs only residual magnitude (quantization SNR),
never correctness. No overflow tail, no reshard, no re-encode.

The optional refine tier keeps whole rows as host-DRAM int8 (51 GB at
50M×d1024 — capacity in HBM, precision from host DRAM) and exactly
rescores the candidate pool.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bits_pallas import (
    N_PLANES,
    decode_bits_planar,
    encode_bits_planar,
    ivf_bits_topk_pallas,
)
from ..ops.kmeans import kmeans


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class IVFBitsIndex:
    """Streaming binary-residual index over a list-major global store."""

    def __init__(
        self,
        centroids: jax.Array,  # [L, D] f32
        *,
        capacity: int,
        block_n: int = 1024,
        refine: bool = True,
    ) -> None:
        l, d = centroids.shape
        if d % N_PLANES:
            raise ValueError(f"D={d} must be divisible by {N_PLANES}")
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.block_n = int(block_n)
        self.cap_l = _round_up(-(-int(capacity) // l), self.block_n)
        self.n_cap = l * self.cap_l
        self.blocks_per_list = self.cap_l // self.block_n
        self.refine = refine
        self.d = d
        self._w = d // N_PLANES
        self.codes = jnp.zeros((self.n_cap, self._w), jnp.uint8)
        # BLOCK-MAJOR [n_blocks, planes, block_n]: the slot axis stays
        # minor (exact HBM tiling — an [N, 8] layout pads 8 lanes to 128
        # = 16× memory) while the kernel's dynamic probe offset indexes
        # the LEADING dim (Mosaic rejects dynamic lane-dim offsets).
        # scales[:, 0, :] = -1 marks empty; real scales are ≥ 0
        self.scales = jnp.full(
            (self.n_cap // self.block_n, N_PLANES, self.block_n),
            -1.0, jnp.float32,
        )
        self.gid = jnp.full((self.n_cap,), -1, jnp.int32)
        self.fill = np.zeros(l, np.int64)  # host-side per-list cursors
        self.total_rows = 0
        self.host_int8: list[np.ndarray] = []
        self.host_scale8: list[np.ndarray] = []
        self._host_cat = None

    # ---------------- construction ----------------

    @classmethod
    def train(
        cls,
        sample: jax.Array,
        nlist: int,
        *,
        capacity: int,
        iters: int = 10,
        seed: int = 0,
        **kwargs,
    ) -> "IVFBitsIndex":
        nlist = min(nlist, max(1, sample.shape[0] // 4))
        centroids, _ = kmeans(sample, nlist, iters=iters, seed=seed)
        return cls(centroids, capacity=capacity, **kwargs)

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def bytes_resident(self) -> int:
        return int(
            self.codes.size
            + self.scales.size * 4
            + self.gid.size * 4
            + self.centroids.size * 4
        )

    @property
    def bytes_host(self) -> int:
        return int(
            sum(a.nbytes for a in self.host_int8)
            + sum(a.nbytes for a in self.host_scale8)
        )

    # ---------------- append ----------------

    def _place(self, choices: np.ndarray) -> np.ndarray:
        """Host-side spill placement: nearest centroid with free space.

        ``choices [m, S]`` = per-row nearest-centroid ranking. Vectorized
        per choice level: stable-sort rows by candidate list, accept the
        first ``space`` of each list, demote the rest to their next
        choice. Rows exhausting all S choices land in ANY list with
        space (scored exactly either way — see module docstring)."""
        m, s_max = choices.shape
        l = self.nlist
        space = self.cap_l - self.fill.copy()
        place = np.full(m, -1, np.int64)
        for s in range(s_max):
            un = np.flatnonzero(place < 0)
            if un.size == 0:
                break
            cand = choices[un, s].astype(np.int64)
            order = np.argsort(cand, kind="stable")
            sorted_c = cand[order]
            starts = np.searchsorted(sorted_c, np.arange(l))
            rank = np.arange(sorted_c.size) - starts[sorted_c]
            ok = rank < space[sorted_c]
            place[un[order[ok]]] = sorted_c[ok]
            taken = np.bincount(sorted_c[ok], minlength=l)
            space -= taken
        left = np.flatnonzero(place < 0)
        if left.size:
            if space.sum() < left.size:
                raise ValueError(
                    f"index full: {left.size} rows do not fit "
                    f"(capacity {self.n_cap}, stored {self.total_rows})"
                )
            free_slots = np.repeat(np.arange(l), space)
            place[left] = free_slots[: left.size]
        return place

    def append(self, embeddings: jax.Array) -> np.ndarray:
        """Encode + scatter one chunk; returns assigned global row ids."""
        m, d = embeddings.shape
        if d != self.d:
            raise ValueError(f"dim {d} != index dim {self.d}")
        emb = jnp.asarray(embeddings)
        # nearest-centroid ranking (top-4 spill choices), blockwise
        choices = np.asarray(
            _assign_choices(emb, self.centroids, min(4, self.nlist))
        )
        place = self._place(choices)
        # slot positions: list base + current fill + arrival rank in batch
        order = np.argsort(place, kind="stable")
        sorted_l = place[order]
        starts = np.searchsorted(sorted_l, np.arange(self.nlist))
        rank = np.arange(m) - starts[sorted_l]
        pos = np.empty(m, np.int64)
        pos[order] = sorted_l * self.cap_l + self.fill[sorted_l] + rank
        gids = np.arange(self.total_rows, self.total_rows + m, dtype=np.int64)

        self.codes, self.scales, self.gid = _encode_scatter(
            self.codes, self.scales, self.gid,
            emb, self.centroids,
            jnp.asarray(place, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(gids, jnp.int32),
        )
        self.fill += np.bincount(place, minlength=self.nlist)
        self.total_rows += m
        if self.refine:
            from ..ops.quant import quantize_int8

            codes8, scale8 = jax.jit(quantize_int8)(emb)
            self.host_int8.append(np.asarray(codes8))
            self.host_scale8.append(np.asarray(scale8, dtype=np.float32))
            self._host_cat = None
        return gids

    # ---------------- search ----------------

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        nprobe: int = 8,
        refine_k: int | None = None,
        group_l: int = 8,
        tail: str = "fold",
        interpret: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """(scores [Q, k] f32, global row ids [Q, k] i32, −1 empty).

        Query tiles of 8 share a probe list (queries are pre-sorted by
        nearest centroid so tiles are cluster-coherent; results are
        unsorted back). ``refine_k``: pool size exactly rescored by the
        host int8 tier before the final top-k."""
        q = queries.shape[0]
        if self.total_rows == 0:
            return (
                jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32),
            )
        # the Mosaic kernel only lowers on TPU; everywhere else run the
        # interpreter (tests, CPU service fallback)
        interpret = interpret or jax.default_backend() != "tpu"
        nprobe = min(nprobe, self.nlist)
        do_refine = bool(refine_k) and bool(self.host_int8)
        k_dev = max(k, refine_k) if do_refine else k

        qf = jnp.asarray(queries, jnp.float32)
        vals, rows = _bits_search(
            qf, self.centroids, self.codes, self.scales, self.gid,
            k=k_dev, nprobe=nprobe, block_n=self.block_n,
            blocks_per_list=self.blocks_per_list, group_l=group_l,
            tail=tail, interpret=interpret,
        )
        if not do_refine:
            return vals[:, :k], rows[:, :k]
        if self._host_cat is None:
            self._host_cat = (
                np.concatenate(self.host_int8),
                np.concatenate(self.host_scale8),
            )
            # replace the chunk list with the consolidated array so the
            # originals free — at 50M×d1024 the tier is 51 GB and keeping
            # both copies would hold 102 GB of host RAM
            self.host_int8 = [self._host_cat[0]]
            self.host_scale8 = [self._host_cat[1]]
        host8, hscale = self._host_cat
        rows_np = np.asarray(rows)
        q_np = np.asarray(qf)
        safe = np.clip(rows_np, 0, len(host8) - 1)
        cand = host8[safe].astype(np.float32)
        exact = np.einsum("qkd,qd->qk", cand, q_np) * hscale[safe]
        exact = np.where(rows_np >= 0, exact, -np.inf)
        order = np.argsort(-exact, axis=1)[:, :k]
        out_vals = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        out_rows = np.take_along_axis(rows_np, order, axis=1)
        out_rows = np.where(np.isfinite(out_vals), out_rows, -1)
        return jnp.asarray(out_vals), jnp.asarray(out_rows)

    # ---------------- persistence ----------------

    def save(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays = {
            "centroids": np.asarray(self.centroids),
            "codes": np.asarray(self.codes),
            "scales": np.asarray(self.scales),
            "gid": np.asarray(self.gid),
            "fill": self.fill,
        }
        for i, a in enumerate(self.host_int8):
            arrays[f"host_int8_{i}"] = a
            arrays[f"host_scale8_{i}"] = self.host_scale8[i]
        np.savez(path, **arrays)
        meta = {
            "capacity": self.n_cap,
            "block_n": self.block_n,
            "refine": self.refine,
            "total_rows": self.total_rows,
            "n_host": len(self.host_int8),
        }
        Path(str(path) + ".meta.json").write_text(
            json.dumps(meta), encoding="utf-8"
        )

    @classmethod
    def load(cls, path) -> "IVFBitsIndex":
        path = Path(path)
        arrays = np.load(
            str(path) if str(path).endswith(".npz") else f"{path}.npz"
        )
        meta = json.loads(
            Path(str(path) + ".meta.json").read_text(encoding="utf-8")
        )
        index = cls(
            jnp.asarray(arrays["centroids"]),
            capacity=meta["capacity"],
            block_n=meta["block_n"],
            refine=meta["refine"],
        )
        index.codes = jnp.asarray(arrays["codes"])
        index.scales = jnp.asarray(arrays["scales"])
        index.gid = jnp.asarray(arrays["gid"])
        index.fill = arrays["fill"]
        index.total_rows = meta["total_rows"]
        index.host_int8 = [
            arrays[f"host_int8_{i}"] for i in range(meta["n_host"])
        ]
        index.host_scale8 = [
            arrays[f"host_scale8_{i}"] for i in range(meta["n_host"])
        ]
        return index


# ---------------- jitted helpers ----------------


@functools.partial(jax.jit, static_argnames=("s",))
def _assign_choices(emb, centroids, s):
    """Top-s centroid ids per row, blockwise (bounds the [n, L] score
    transient at 32k rows — the segment encoder's lesson)."""
    n, d = emb.shape
    blk = 32_768
    n_pad = -(-n // blk) * blk
    emb_p = jnp.pad(emb, ((0, n_pad - n), (0, 0))) if n_pad != n else emb

    def body(_, rows):
        sc = jax.lax.dot_general(
            rows, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jax.lax.top_k(sc, s)[1].astype(jnp.int32)

    _, out = jax.lax.scan(body, None, emb_p.reshape(-1, blk, d))
    return out.reshape(n_pad, s)[:n]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _encode_scatter(codes, scales, gid, emb, centroids, place, pos, gids):
    """Residual-encode one chunk blockwise and scatter into the store."""
    n, d = emb.shape
    blk = 32_768
    n_pad = -(-n // blk) * blk
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
        place = jnp.pad(place, (0, n_pad - n))

    def body(_, inp):
        rows, lst = inp
        resid = rows - centroids[lst]
        return None, encode_bits_planar(resid)

    _, (codes_b, scales_b) = jax.lax.scan(
        body, None,
        (emb.reshape(-1, blk, d), place.reshape(-1, blk)),
    )
    new_codes = codes_b.reshape(n_pad, -1)[:n]
    new_scales = scales_b.reshape(n_pad, -1)[:n]
    block_n = scales.shape[2]
    codes = codes.at[pos].set(new_codes, mode="drop")
    scales = scales.at[pos // block_n, :, pos % block_n].set(
        new_scales, mode="drop"
    )
    gid = gid.at[pos].set(gids, mode="drop")
    return codes, scales, gid


@functools.partial(jax.jit, static_argnames=("nprobe",))
def tile_probes(queries, centroids, nprobe):
    """Cluster-coherent query tiling + tile-shared probe selection —
    the pre-pass shared by the single-chip and sharded (ShardedBits)
    search paths. Returns ``(order [Qp], qs [Qp, D], probes [T, nprobe]
    list ids, c_sel [Qp, nprobe])`` with Qp = Q rounded up to 8.

    Sorts queries by nearest centroid so tiles of 8 are
    cluster-coherent, then picks tile-shared probes with a per-member
    guarantee: every query's top-1 list is force-included (scatter
    +inf into the tile-sum scores — idempotent, so duplicates
    collapse), remaining probe slots go to the best tile-shared lists.
    Without the guarantee a tile of 8 queries from 8 DIFFERENT clusters
    probes only nprobe of their 8 home lists and the missed queries
    lose their entire neighbor set (measured: pool recall 0.65 on a
    16-cluster mix). Needs nprobe ≥ distinct member top-1s (≤ 8) for
    full coverage — hence default 8."""
    q = queries.shape[0]
    c_scores = jax.lax.dot_general(
        queries, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, L]
    top1 = jnp.argmax(c_scores, axis=1)
    order = jnp.argsort(top1)
    q_pad = _round_up(q, 8)
    if q_pad != q:
        order = jnp.concatenate(
            [order, jnp.full((q_pad - q,), order[-1], order.dtype)]
        )
    qs = queries[order]
    cs = c_scores[order]
    t = q_pad // 8
    tile_cs = cs.reshape(t, 8, -1)
    tile_sum = tile_cs.sum(axis=1)
    top1 = jnp.argmax(tile_cs, axis=2)  # [T, 8]
    boosted = tile_sum.at[jnp.arange(t)[:, None], top1].set(jnp.inf)
    _, probes = jax.lax.top_k(boosted, nprobe)  # [T, nprobe]
    c_sel = jnp.take_along_axis(
        cs, jnp.repeat(probes, 8, axis=0), axis=1
    )  # [Qp, nprobe] — each query keeps its OWN centroid dot
    return order, qs, probes, c_sel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "block_n", "blocks_per_list", "group_l", "tail",
        "interpret",
    ),
)
def _bits_search(
    queries, centroids, codes, scales, gid,
    *, k, nprobe, block_n, blocks_per_list, group_l, tail, interpret,
):
    q = queries.shape[0]
    order, qs, probes, c_sel = tile_probes(queries, centroids, nprobe)
    probe_blocks = probes * blocks_per_list
    # group_l trades tail width for in-group winner-take-all: a true
    # neighbor must out-rank its group_l-strided groupmates by NOISY
    # binary score, so small lists (few rows per group's sampling pool)
    # want small groups; at ≥10k rows/list group_l=8 loses <1% (the
    # rank·L/rows birthday math, with binary noise folded into rank)
    vals, slots = ivf_bits_topk_pallas(
        qs, codes, scales, probe_blocks.astype(jnp.int32), c_sel, k,
        blocks_per_list=blocks_per_list, block_n=block_n, group_l=group_l,
        tail=tail, interpret=interpret,
    )
    rows = jnp.where(jnp.isfinite(vals), gid[slots], -1)
    # unsort back to caller order (order[:q] is the true permutation;
    # the padded tail rows are duplicates of the last query, dropped)
    inv = jnp.argsort(order[:q])
    return vals[inv], rows[inv]
