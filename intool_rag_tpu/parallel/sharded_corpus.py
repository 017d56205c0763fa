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

from .sharded_search import sharded_flat_topk


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class ShardedCorpus:
    """Row-sharded embedding corpus with incremental append."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        *,
        capacity_per_shard: int = 1024,
        dtype=jnp.float32,
        growth: float = 2.0,
    ) -> None:
        self.dim = dim
        self.mesh = mesh
        self.n_shards = mesh.shape["data"]
        self.cap = _round_up(capacity_per_shard, 8)
        self.dtype = dtype
        self.growth = growth
        self.counts = np.zeros(self.n_shards, np.int32)  # host-side truth
        self.data = jax.device_put(
            jnp.zeros((self.n_shards * self.cap, dim), dtype),
            NamedSharding(mesh, P("data", None)),
        )
        self._place = self._build_place()

    # ---------------- info ----------------

    @property
    def valid_n(self) -> int:
        return int(self.counts.sum())

    def global_rows(self, shard: np.ndarray, slot: np.ndarray) -> np.ndarray:
        return slot.astype(np.int64) * self.n_shards + shard

    # ---------------- append ----------------

    def _build_place(self):
        mesh = self.mesh

        @functools.partial(jax.jit, donate_argnums=(0,))
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("data", None), P(None, None), P(None), P(None)),
            out_specs=P("data", None),
            check_vma=False,
        )
        def place(local, batch, dest_shard, dest_slot):
            sid = jax.lax.axis_index("data")
            mine = dest_shard == sid
            # rows of other shards scatter out of range and drop
            slots = jnp.where(mine, dest_slot, local.shape[0])
            return local.at[slots].set(batch.astype(local.dtype), mode="drop")

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
        self.data = self._place(
            self.data,
            jnp.asarray(batch),
            jnp.asarray(dest_shard),
            jnp.asarray(dest_slot),
        )
        self.counts = counts
        return self.global_rows(dest_shard, dest_slot)

    def _grow(self, need_rows: int) -> None:
        """Amortized regrow: gather valid rows per shard to the host once,
        re-place into a larger buffer (rare — O(N) like vector doubling)."""
        new_cap = _round_up(
            max(int(need_rows * self.growth / self.n_shards) + 1, self.cap * 2), 8
        )
        host = np.asarray(self.data).reshape(self.n_shards, self.cap, self.dim)
        new_host = np.zeros((self.n_shards, new_cap, self.dim), host.dtype)
        for s in range(self.n_shards):
            c = int(self.counts[s])
            new_host[s, :c] = host[s, :c]
        self.cap = new_cap
        self.data = jax.device_put(
            jnp.asarray(new_host.reshape(-1, self.dim), self.dtype),
            NamedSharding(self.mesh, P("data", None)),
        )
        self._place = self._build_place()

    # ---------------- query ----------------

    def search(self, queries: jax.Array, k: int, *, block_n: int = 16384):
        """Global top-k; returned indices are global row ids."""
        return sharded_flat_topk(
            queries,
            self.data,
            k,
            self.mesh,
            valid_n=self.counts,
            block_n=min(block_n, self.cap),
        )
