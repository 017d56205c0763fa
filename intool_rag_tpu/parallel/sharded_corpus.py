"""Incremental sharded corpus: O(batch) streaming appends over the mesh.

SURVEY.md §5.8(c) calls for streaming-ingest placement of new chunks
across the device mesh. Round 1 appended by host-concat + re-device_put
of the whole corpus — O(N) bytes per append. Here each shard keeps spare
capacity and new rows land via an in-shard scatter inside ``shard_map``:
only the batch (replicated, O(batch · n_shards) bytes) moves; the corpus
never leaves the devices. When capacity runs out the corpus regrows by
``growth`` (amortized O(1) per appended row, like vector doubling).

Row identity: global row id = ``slot · n_shards + shard`` (interleaved) —
independent of per-shard capacity, so ids survive both appends and
regrowth (existing rows keep their shard and slot), and host-side
identity tables can key on them.

Quantized tiers (``quant="int8"`` / ``"int8r"``) store the corpus as
int8 codes + per-row scales (+ the int8 residual plane for ~15-bit
corpus precision, ops/quant.py) — the single-chip capacity tiers
composed with sharding: appends quantize rows on device (row-local, so
codes equal the single-chip mirror's), and search runs the fused int8
Pallas kernel per shard (parallel/sharded_search.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharded_search import pallas_group_l, sharded_flat_topk, sharded_flat_topk_int8


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class ShardedCorpus:
    """Row-sharded embedding corpus with incremental append.

    ``quant``: ``"none"`` stores rows at ``dtype``; ``"int8"`` stores
    int8 codes + f32 scales (half the bytes of bf16); ``"int8r"`` adds
    the residual int8 plane (bf16's bytes, ~15-bit precision). The
    quantized tiers search via the fused int8 Pallas kernel — real on
    TPU, interpret-mode elsewhere (CPU-mesh tests / dryrun).
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        *,
        capacity_per_shard: int = 1024,
        dtype=jnp.float32,
        growth: float = 2.0,
        quant: str = "none",
        interpret: bool | None = None,
    ) -> None:
        if quant not in ("none", "int8", "int8r"):
            raise ValueError(f"unknown quant mode {quant!r}")
        self.dim = dim
        # the fused kernels need D % 128 == 0; zero-padding the feature
        # axis leaves per-row absmax quantization and inner products
        # unchanged, so pad transparently for the quantized tiers
        self.dim_pad = _round_up(dim, 128) if quant != "none" else dim
        self.mesh = mesh
        self.n_shards = mesh.shape["data"]
        # Pallas kernels need shard_rows % (128·group_l) == 0; quantized
        # tiers round capacity to the smallest block so the kernel always
        # has a usable width (group_l=1 at worst — tests; ≥8 in prod caps)
        self.row_align = 128 if quant != "none" else 8
        self.cap = _round_up(capacity_per_shard, self.row_align)
        self.dtype = dtype
        self.growth = growth
        self.quant = quant
        self.interpret = interpret
        self.counts = np.zeros(self.n_shards, np.int32)  # host-side truth
        self._alloc()
        self._place = self._build_place()

    # ---------------- storage planes ----------------

    def _alloc(self) -> None:
        rows = self.n_shards * self.cap
        mesh = self.mesh
        sh2 = NamedSharding(mesh, P("data", None))
        sh1 = NamedSharding(mesh, P("data"))
        if self.quant == "none":
            self.data = jax.device_put(
                jnp.zeros((rows, self.dim), self.dtype), sh2
            )
        else:
            self.codes = jax.device_put(
                jnp.zeros((rows, self.dim_pad), jnp.int8), sh2
            )
            self.scales = jax.device_put(jnp.zeros((rows,), jnp.float32), sh1)
            self.res = (
                jax.device_put(jnp.zeros((rows, self.dim_pad), jnp.int8), sh2)
                if self.quant == "int8r"
                else None
            )

    def _planes(self) -> tuple[jax.Array, ...]:
        if self.quant == "none":
            return (self.data,)
        if self.quant == "int8":
            return (self.codes, self.scales)
        return (self.codes, self.scales, self.res)

    def _set_planes(self, planes: tuple[jax.Array, ...]) -> None:
        if self.quant == "none":
            (self.data,) = planes
        elif self.quant == "int8":
            self.codes, self.scales = planes
        else:
            self.codes, self.scales, self.res = planes

    def _plane_specs(self) -> tuple:
        if self.quant == "none":
            return (P("data", None),)
        if self.quant == "int8":
            return (P("data", None), P("data"))
        return (P("data", None), P("data"), P("data", None))

    def _encode(self, batch: jnp.ndarray) -> tuple[jax.Array, ...]:
        """Quantize an append batch into per-plane rows (row-local — the
        codes equal the single-chip int8 mirror's for the same rows)."""
        batch = jnp.asarray(batch)
        if self.quant == "none":
            return (batch,)
        if batch.shape[1] != self.dim_pad:
            batch = jnp.pad(batch, ((0, 0), (0, self.dim_pad - batch.shape[1])))
        from ..ops.quant import quantize_int8, quantize_int8_residual

        if self.quant == "int8":
            q8, s8 = jax.jit(quantize_int8)(batch)
            return (q8, s8)
        q1, q2, s8 = jax.jit(quantize_int8_residual)(batch)
        return (q1, s8, q2)

    # ---------------- info ----------------

    @property
    def valid_n(self) -> int:
        return int(self.counts.sum())

    def global_rows(self, shard: np.ndarray, slot: np.ndarray) -> np.ndarray:
        return slot.astype(np.int64) * self.n_shards + shard

    # ---------------- append ----------------

    def _build_place(self):
        mesh = self.mesh
        plane_specs = self._plane_specs()
        batch_specs = tuple(
            P(None, None) if len(s) == 2 else P(None) for s in plane_specs
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(plane_specs, batch_specs, P(None), P(None)),
            out_specs=plane_specs,
            check_vma=False,
        )
        def place(locals_, batches, dest_shard, dest_slot):
            sid = jax.lax.axis_index("data")
            mine = dest_shard == sid
            out = []
            for local, batch in zip(locals_, batches):
                # rows of other shards scatter out of range and drop
                slots = jnp.where(mine, dest_slot, local.shape[0])
                out.append(
                    local.at[slots].set(batch.astype(local.dtype), mode="drop")
                )
            return tuple(out)

        return place

    def append(self, batch: np.ndarray) -> np.ndarray:
        """Append ``[M, dim]`` rows. Returns their global row ids [M].

        Placement is greedy-balanced: each row goes to the currently
        emptiest shard. Only the batch crosses host→device; existing
        rows never move (the donated buffer updates in place on device).
        """
        m = batch.shape[0]
        if m == 0:
            return np.zeros(0, np.int64)
        if self.valid_n + m > self.n_shards * self.cap:
            self._grow(self.valid_n + m)
        # Vectorized greedy balance, O(M log M) host work (round-2 verdict
        # item 9 — the per-row argmax loop was O(M·n_shards)): the greedy
        # "emptiest shard first" rule is equivalent to leveling water: rows
        # fill shards so final counts are as equal as the capacity allows.
        # Compute each shard's take via the waterline, then order the
        # per-shard slot ranges so low-count shards are served first
        # (identical placement to the sequential rule).
        counts = self.counts.copy()
        order = np.argsort(counts, kind="stable")
        sorted_counts = counts[order].astype(np.int64)
        # waterline L: sum(max(0, min(L, cap) - c_s)) >= m, minimal L
        lo, hi = int(sorted_counts[0]), self.cap
        while lo < hi:
            mid = (lo + hi) // 2
            if np.maximum(0, np.minimum(mid, self.cap) - sorted_counts).sum() >= m:
                hi = mid
            else:
                lo = mid + 1
        level = lo
        take = np.maximum(0, np.minimum(level, self.cap) - sorted_counts)
        # at the final level some shards take one row less: trim overshoot
        # from the shards that reached the waterline last (highest start
        # count first — they'd have been filled last by the greedy rule)
        excess = int(take.sum() - m)
        if excess > 0:
            at_level = np.flatnonzero(take > 0)
            # remove one from the largest-original-count shards at level
            trim = at_level[np.argsort(-sorted_counts[at_level], kind="stable")]
            take[trim[:excess]] -= 1
        dest_shard = np.repeat(order, take).astype(np.int32)
        starts = counts[dest_shard]
        # slot = start count + within-shard running index
        within = np.arange(m) - np.repeat(
            np.concatenate([[0], np.cumsum(take)[:-1]]), take
        )
        dest_slot = (starts + within).astype(np.int32)
        counts = counts.copy()
        np.add.at(counts, dest_shard, 1)
        new_planes = self._place(
            self._planes(),
            self._encode(batch),
            jnp.asarray(dest_shard),
            jnp.asarray(dest_slot),
        )
        self._set_planes(new_planes)
        self.counts = counts
        return self.global_rows(dest_shard, dest_slot)

    def _grow(self, need_rows: int) -> None:
        """Amortized regrow: gather valid rows per shard to the host once,
        re-place into a larger buffer (rare — O(N) like vector doubling)."""
        new_cap = _round_up(
            max(int(need_rows * self.growth / self.n_shards) + 1, self.cap * 2),
            self.row_align,
        )
        planes = self._planes()
        new_planes = []
        for plane in planes:
            host = np.asarray(plane)
            tail_shape = host.shape[1:]
            host = host.reshape((self.n_shards, self.cap) + tail_shape)
            new_host = np.zeros(
                (self.n_shards, new_cap) + tail_shape, host.dtype
            )
            for s in range(self.n_shards):
                c = int(self.counts[s])
                new_host[s, :c] = host[s, :c]
            spec = P("data", *([None] * len(tail_shape)))
            new_planes.append(
                jax.device_put(
                    jnp.asarray(new_host.reshape((-1,) + tail_shape)),
                    NamedSharding(self.mesh, spec),
                )
            )
        self.cap = new_cap
        self._set_planes(tuple(new_planes))
        self._place = self._build_place()

    # ---------------- query ----------------

    def _interpret(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        return jax.default_backend() != "tpu"

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        block_n: int = 16384,
        kernel: str | None = None,
        group_l: int | None = None,
        tail: str = "fold",
    ):
        """Global top-k; returned indices are global row ids.

        ``kernel`` (quant="none" only): None auto-selects the fused
        Pallas per-shard kernel on TPU, the XLA scan elsewhere; "pallas"
        forces the kernel (interpret-mode off-TPU — CPU-mesh tests)."""
        if self.quant != "none":
            if queries.shape[1] != self.dim_pad:
                queries = jnp.pad(
                    queries, ((0, 0), (0, self.dim_pad - queries.shape[1]))
                )
            return sharded_flat_topk_int8(
                queries,
                self.codes,
                self.scales,
                k,
                self.mesh,
                res=self.res,
                valid_n=self.counts,
                group_l=group_l,
                tail=tail,
                interpret=self._interpret(),
            )
        if kernel is None:
            on_tpu = jax.default_backend() == "tpu"
            kernel = (
                "pallas"
                if on_tpu and pallas_group_l(self.cap, k) is not None
                else "xla"
            )
        return sharded_flat_topk(
            queries,
            self.data,
            k,
            self.mesh,
            valid_n=self.counts,
            block_n=min(block_n, self.cap),
            kernel=kernel,
            group_l=group_l,
            tail=tail,
            interpret=self._interpret() if kernel == "pallas" else False,
        )
