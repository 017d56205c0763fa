"""Distributed k-means: points sharded over the ``data`` axis, centroid
statistics reduced with psum (the design in SURVEY.md §5.8 (b): per-shard
assignment + psum centroid update). Used for IVF coarse-quantizer
training when the corpus doesn't fit one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kmeans import _kmeans_pp_init


def sharded_kmeans(
    points: jax.Array,  # [N_pad, D] sharded P("data", None)
    k: int,
    mesh: Mesh,
    *,
    valid_n: int | None = None,
    iters: int = 10,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd over a row-sharded point set.

    Returns (centroids [K, D] f32 replicated, assignments [N_pad] i32
    sharded like the points; padding rows get assignment -1).
    """
    n, d = points.shape
    n_shards = mesh.shape["data"]
    shard_rows = n // n_shards
    if valid_n is None:
        valid_n = n

    # init on a host-gathered subsample (cheap: only the sample moves)
    sample_rows = min(valid_n, max(4 * k, 4096))
    sample = points[:sample_rows]  # resharded automatically
    init = _kmeans_pp_init(
        jnp.asarray(sample), k, jax.random.PRNGKey(seed)
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None)),
        out_specs=(P(None, None), P("data")),
        check_vma=False,
    )
    def one_iter(local_points, centroids):
        shard_idx = jax.lax.axis_index("data")
        start = shard_idx * shard_rows
        local_valid = jnp.clip(valid_n - start, 0, shard_rows)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (shard_rows, 1), 0)[:, 0]
        valid_mask = row_ids < local_valid

        c_norms = jnp.sum(centroids**2, axis=1)
        scores = (
            2.0
            * jax.lax.dot_general(
                local_points,
                centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - c_norms[None, :]
        )
        assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        one_hot = jnp.where(valid_mask[:, None], one_hot, 0.0)
        sums = jax.lax.dot_general(
            one_hot,
            local_points.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(one_hot, axis=0)
        # global reduction over shards — rides ICI
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        # keep old centroid for empty clusters
        new_centroids = jnp.where(
            (counts < 0.5)[:, None], centroids, new_centroids
        )
        assign = jnp.where(valid_mask, assign, -1)
        return new_centroids, assign

    one_iter_jit = jax.jit(one_iter)
    centroids = init
    assignments = None
    for _ in range(iters):
        centroids, assignments = one_iter_jit(points, centroids)
    return centroids, assignments
