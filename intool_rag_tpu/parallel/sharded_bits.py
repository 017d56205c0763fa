"""ShardedBits: the binary-residual capacity tier composed with the mesh.

Round-4 verdict item 6: beyond-50M sharding previously composed only the
flat int8/int8r planes (~1024 B/row via ``ShardedCorpus``); the 192 B/row
bits design (``index/bits_index.py``) was single-chip only, so multi-chip
capacity scaling paid 5× the bytes/row of the single-chip capacity tier.
This module row-shards the bits store itself.

Layout — every IVF list's slot range is split EQUALLY across shards:
shard ``s`` owns, for each list ``l``, the contiguous local range
``[l·cap_ls, (l+1)·cap_ls)`` of its own store, where ``cap_ls = cap_l/S``.
The global store is therefore the concatenation of S fully-valid local
list-major stores, and ``P("data")`` row-sharding on the leading axis
hands each device exactly one of them. Two properties fall out:

- **The probe pre-pass is shard-invariant.** List ``l`` starts at local
  block ``l·blocks_per_list_local`` on EVERY shard, so the tile-probe
  selection (``index.bits_index.tile_probes``) runs once, replicated,
  and the same ``probe_blocks`` feed every shard's kernel — no
  per-shard probe translation, no ragged probe counts (the failure mode
  of sharding by whole lists, where a query's nprobe lists land on a
  variable subset of shards).
- **Per-shard search IS the single-chip kernel** (`ivf_bits_topk_pallas`)
  over a store with ``blocks_per_list/S`` blocks per list; the merge is
  the standard all-gather of ``k`` (value, gid) candidates over ICI —
  identical collective shape to ``sharded_flat_topk``
  (parallel/sharded_search.py).

Scoring decomposition ``q·x ≈ q·c_list + q·r̂`` is row-local, so a row
scores identically wherever it lives — sub-shard placement (least-filled
shard within the target list) affects only load balance, never scores.

Parity role: FAISS-style IVF-PQ capacity tier × the distributed layer
the reference lacks entirely (SURVEY §2.9, §5.8; reference stops at a
single-process ``IndexFlatL2``, rag/storage/faiss_index.py:106-128).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.bits_index import _assign_choices, _encode_scatter, tile_probes
from ..ops.bits_pallas import N_PLANES, ivf_bits_topk_pallas
from ..ops.kmeans import kmeans


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class ShardedBitsIndex:
    """Streaming binary-residual index row-sharded over ``mesh["data"]``."""

    def __init__(
        self,
        centroids: jax.Array,  # [L, D] f32
        mesh: Mesh,
        *,
        capacity: int,
        block_n: int = 1024,
    ) -> None:
        l, d = centroids.shape
        if d % N_PLANES:
            raise ValueError(f"D={d} must be divisible by {N_PLANES}")
        self.mesh = mesh
        self.n_shards = int(mesh.shape["data"])
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.block_n = int(block_n)
        # per-list PER-SHARD capacity, block-aligned
        self.cap_ls = _round_up(
            -(-int(capacity) // (l * self.n_shards)), self.block_n
        )
        self.cap_l = self.cap_ls * self.n_shards
        self.local_cap = l * self.cap_ls
        self.n_cap = self.local_cap * self.n_shards
        self.local_blocks = self.cap_ls // self.block_n  # blocks/list/shard
        self.d = d
        self._w = d // N_PLANES
        sh = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
        self.codes = jnp.zeros(
            (self.n_cap, self._w), jnp.uint8, device=sh("data", None)
        )
        # block-major scales (see ops/bits_pallas.py); leading dim
        # n_cap/block_n = S · local_blocks·L splits evenly over shards
        self.scales = jnp.full(
            (self.n_cap // self.block_n, N_PLANES, self.block_n), -1.0,
            jnp.float32, device=sh("data", None, None),
        )
        self.gid = jnp.full((self.n_cap,), -1, jnp.int32, device=sh("data"))
        self.fill = np.zeros((l, self.n_shards), np.int64)  # host cursors
        self.total_rows = 0

    @classmethod
    def train(
        cls,
        sample: jax.Array,
        nlist: int,
        mesh: Mesh,
        *,
        capacity: int,
        iters: int = 10,
        seed: int = 0,
        **kwargs,
    ) -> "ShardedBitsIndex":
        nlist = min(nlist, max(1, sample.shape[0] // 4))
        centroids, _ = kmeans(sample, nlist, iters=iters, seed=seed)
        return cls(centroids, mesh, capacity=capacity, **kwargs)

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def bytes_per_shard(self) -> int:
        return (
            self.codes.size + self.scales.size * 4 + self.gid.size * 4
        ) // self.n_shards + self.centroids.size * 4

    # ---------------- append ----------------

    def _place(self, choices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Nearest centroid with free TOTAL space (spill to later
        choices under skew — same policy as the single-chip
        ``IVFBitsIndex._place``), then the least-filled shard within the
        chosen list. Returns ``(list_id [m], shard_id [m])``."""
        m, s_max = choices.shape
        l = self.nlist
        space = self.cap_l - self.fill.sum(axis=1)
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
            space -= np.bincount(sorted_c[ok], minlength=l)
        left = np.flatnonzero(place < 0)
        if left.size:
            if space.sum() < left.size:
                raise ValueError(
                    f"index full: {left.size} rows do not fit "
                    f"(capacity {self.n_cap}, stored {self.total_rows})"
                )
            free_slots = np.repeat(np.arange(l), space)
            place[left] = free_slots[: left.size]
        # shard choice: round-robin over the least-filled shards of each
        # list (balances ICI load; scores are placement-invariant)
        shard = np.empty(m, np.int64)
        fill = self.fill.copy()
        for lid in np.unique(place):
            rows = np.flatnonzero(place == lid)
            f = fill[lid].copy()
            for r in rows:
                s = int(np.argmin(f))
                if f[s] >= self.cap_ls:
                    raise ValueError(f"list {lid} full on every shard")
                shard[r] = s
                f[s] += 1
            fill[lid] = f
        return place, shard

    def append(self, embeddings: jax.Array) -> np.ndarray:
        """Encode + scatter one chunk; returns assigned global row ids."""
        m, d = embeddings.shape
        if d != self.d:
            raise ValueError(f"dim {d} != index dim {self.d}")
        emb = jnp.asarray(embeddings)
        choices = np.asarray(
            _assign_choices(emb, self.centroids, min(4, self.nlist))
        )
        place, shard = self._place(choices)
        # slot = shard·local_cap + list·cap_ls + fill[list, shard] + rank
        key = shard * self.nlist + place  # group by (shard, list)
        order = np.argsort(key, kind="stable")
        sorted_key = key[order]
        starts = np.searchsorted(sorted_key, np.arange(self.n_shards * self.nlist))
        rank = np.arange(m) - starts[sorted_key]
        pos = np.empty(m, np.int64)
        pos[order] = (
            shard[order] * self.local_cap
            + place[order] * self.cap_ls
            + self.fill[place[order], shard[order]]
            + rank
        )
        gids = np.arange(self.total_rows, self.total_rows + m, dtype=np.int64)
        self.codes, self.scales, self.gid = _encode_scatter(
            self.codes, self.scales, self.gid,
            emb, self.centroids,
            jnp.asarray(place, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(gids, jnp.int32),
        )
        np.add.at(self.fill, (place, shard), 1)
        self.total_rows += m
        return gids

    # ---------------- search ----------------

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        nprobe: int = 8,
        group_l: int = 8,
        tail: str = "fold",
        interpret: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """(scores [Q, k] f32, global row ids [Q, k] i32, −1 empty)."""
        q = queries.shape[0]
        if self.total_rows == 0:
            return (
                jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32),
            )
        interpret = interpret or jax.default_backend() != "tpu"
        nprobe = min(nprobe, self.nlist)
        qf = jnp.asarray(queries, jnp.float32)
        return _fused_sharded_bits_search(
            qf, self.centroids, self.codes, self.scales, self.gid,
            mesh=self.mesh, nprobe=nprobe, k=k, block_n=self.block_n,
            local_blocks=self.local_blocks, group_l=group_l, tail=tail,
            interpret=interpret,
        )

    # ---------------- persistence ----------------

    def save(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            centroids=np.asarray(self.centroids),
            codes=np.asarray(self.codes),
            scales=np.asarray(self.scales),
            gid=np.asarray(self.gid),
            fill=self.fill,
        )
        Path(str(path) + ".meta.json").write_text(
            json.dumps({
                "capacity": self.n_cap,
                "block_n": self.block_n,
                "n_shards": self.n_shards,
                "total_rows": self.total_rows,
            }),
            encoding="utf-8",
        )

    @classmethod
    def load(cls, path, mesh: Mesh) -> "ShardedBitsIndex":
        path = Path(path)
        arrays = np.load(
            str(path) if str(path).endswith(".npz") else f"{path}.npz"
        )
        meta = json.loads(
            Path(str(path) + ".meta.json").read_text(encoding="utf-8")
        )
        if int(mesh.shape["data"]) != meta["n_shards"]:
            raise ValueError(
                f"checkpoint was sharded {meta['n_shards']}-way, mesh has "
                f"{mesh.shape['data']} data shards"
            )
        index = cls(
            jnp.asarray(arrays["centroids"]), mesh,
            capacity=meta["capacity"], block_n=meta["block_n"],
        )
        sh = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
        index.codes = jax.device_put(arrays["codes"], sh("data", None))
        index.scales = jax.device_put(arrays["scales"], sh("data", None, None))
        index.gid = jax.device_put(arrays["gid"], sh("data"))
        index.fill = arrays["fill"]
        index.total_rows = meta["total_rows"]
        return index


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "nprobe", "k", "block_n", "local_blocks", "group_l",
        "tail", "interpret",
    ),
)
def _fused_sharded_bits_search(
    qf, centroids, codes, scales, gid,
    *, mesh, nprobe, k, block_n, local_blocks, group_l, tail, interpret,
):
    """Probe selection + sharded top-k + unsort as ONE launch (round-5
    review: the staged version paid an extra device dispatch (~40 ms on
    the tunnel) plus eager argsort/gather per search vs the single-chip
    `_bits_search`, which fuses). The replicated probe pre-pass stays
    valid: same probe list ids are local block offsets on every shard
    (shard-invariant layout — module doc)."""
    order, qs, probes, c_sel = tile_probes(qf, centroids, nprobe)
    probe_blocks = (probes * local_blocks).astype(jnp.int32)
    vals, rows = _sharded_bits_topk(
        qs, codes, scales, gid, probe_blocks, c_sel,
        mesh=mesh, k=k, block_n=block_n, local_blocks=local_blocks,
        group_l=group_l, tail=tail, interpret=interpret,
    )
    inv = jnp.argsort(order[: qf.shape[0]])
    return vals[inv], rows[inv]


def _sharded_bits_topk(
    qs, codes, scales, gid, probe_blocks, c_sel,
    *, mesh, k, block_n, local_blocks, group_l, tail, interpret,
):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None), P("data", None), P("data", None, None),
            P("data"), P(None, None), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(q, local_codes, local_scales, local_gid, pb, cs):
        vals, slots = ivf_bits_topk_pallas(
            q, local_codes, local_scales, pb, cs, k,
            blocks_per_list=local_blocks, block_n=block_n,
            group_l=group_l, tail=tail, interpret=interpret,
        )
        invalid = ~jnp.isfinite(vals)
        # slots are local; gid already stores GLOBAL row ids, so the
        # merge needs no shard-offset arithmetic (cf. _merge_local)
        rows = jnp.where(invalid, -1, local_gid[slots])
        vals = jnp.where(invalid, -jnp.inf, vals)
        all_vals = jax.lax.all_gather(vals, "data", axis=1, tiled=True)
        all_rows = jax.lax.all_gather(rows, "data", axis=1, tiled=True)
        top_vals, top_pos = jax.lax.top_k(
            all_vals, min(k, all_vals.shape[1])
        )
        top_rows = jnp.take_along_axis(all_rows, top_pos, axis=1)
        return top_vals, top_rows

    return search(qs, codes, scales, gid, probe_blocks, c_sel)
