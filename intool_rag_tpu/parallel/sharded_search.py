"""Distributed flat search: corpus sharded over the mesh, local top-k per
shard, all-gather merge (the design from SURVEY.md §5.8: each chip scores
its chunk shard, takes a local top-k, then k·n_chips candidates merge to
a global top-k — collectives ride ICI, the corpus never moves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import flat_topk


def shard_corpus(corpus: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a padded [N, D] corpus row-sharded over the ``data`` axis."""
    n_shards = mesh.shape["data"]
    n = corpus.shape[0]
    if n % n_shards != 0:
        pad = n_shards * (-(-n // n_shards)) - n
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return jax.device_put(corpus, NamedSharding(mesh, P("data", None)))


def sharded_flat_topk(
    queries: jax.Array,
    corpus: jax.Array,  # [N_pad, D] sharded P("data", None)
    k: int,
    mesh: Mesh,
    *,
    valid_n=None,  # int (prefix layout) | [S] array (per-shard counts) | None
    block_n: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus.

    Returns (scores [Q, k], global row indices [Q, k]). ``valid_n`` is
    either the logical corpus length (valid rows are a prefix of the
    concatenated array) or a per-shard count vector ``[n_shards] i32``
    (incremental-append layout, parallel/sharded_corpus.py — each shard
    fills independently).
    """
    n = corpus.shape[0]
    n_shards = mesh.shape["data"]
    shard_rows = n // n_shards
    if valid_n is None:
        valid_n = n
    per_shard = not isinstance(valid_n, int)
    if per_shard:
        counts = jnp.asarray(valid_n, jnp.int32)
        # local selection caps at the shard size, but the MERGED result
        # must still honor the requested k (a shard holds at most
        # shard_rows of the global top-k, so merging n_shards local
        # top-k_local lists stays exact up to k_local·n_shards)
        k = min(k, shard_rows * n_shards)
    else:
        k = min(k, valid_n)
    k_local = min(k, shard_rows)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P("data", None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(q, local_corpus):
        shard_idx = jax.lax.axis_index("data")
        start = shard_idx * shard_rows
        # valid rows within this shard
        if per_shard:
            local_valid = counts[shard_idx]
        else:
            local_valid = jnp.clip(valid_n - start, 0, shard_rows)
        # local exact top-k; the per-shard valid count masks the
        # zero-padded tail BEFORE selection (padding rows score 0.0
        # under 'ip' and would displace real negative-scoring
        # candidates — ADVICE.md round 1)
        local_vals, local_rows = flat_topk(
            q,
            local_corpus,
            k_local,
            metric="ip",
            block_n=min(block_n, shard_rows),
            valid_n=local_valid,
        )
        # map to global rows; -inf slots (shard had < k valid rows)
        # carry arbitrary indices — pin them to -1.
        # Layouts: prefix mode → row = shard·shard_rows + slot (matches
        # the flat concatenated corpus); per-shard mode → interleaved
        # row = slot·n_shards + shard, which is capacity-independent so
        # ids survive ShardedCorpus regrowth.
        invalid = ~jnp.isfinite(local_vals)
        local_vals = jnp.where(invalid, -jnp.inf, local_vals)
        if per_shard:
            gids = local_rows * n_shards + shard_idx
        else:
            gids = local_rows + start
        global_rows = jnp.where(invalid, -1, gids)
        # merge across shards: gather all candidates, global top-k
        all_vals = jax.lax.all_gather(local_vals, "data", axis=1, tiled=True)
        all_rows = jax.lax.all_gather(global_rows, "data", axis=1, tiled=True)
        top_vals, top_pos = jax.lax.top_k(all_vals, min(k, all_vals.shape[1]))
        top_rows = jnp.take_along_axis(all_rows, top_pos, axis=1)
        return top_vals, top_rows

    return search(queries, corpus)
