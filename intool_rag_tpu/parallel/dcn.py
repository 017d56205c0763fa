"""Two-level (DCN, ICI) mesh: multi-slice sharding with hierarchical
collectives.

SURVEY.md §5.8 calls for a DCN-spanning axis for the 10M-chunk config
(BASELINE #5): pods are connected by slow data-center network while
chips within a slice share fast ICI, so collectives must be
hierarchical — merge candidates WITHIN a slice first (ICI all-gather of
k·n_ici values), reduce to k, and only then move k survivors per slice
across DCN (k·n_dcn values) instead of the flat k·n_total. The reference
has no distributed layer at all (SURVEY §2.9); this module is new
capability, simulated here on the virtual CPU mesh (e.g. 2×4) and laid
out so real multi-slice deployment only changes the device grid.

Row-id convention matches :mod:`intool_rag_tpu.parallel.sharded_corpus`:
the linear shard index is ``s = dcn_idx · n_ici + ici_idx`` and global
row id = ``slot · n_shards + s``, so a 1-D ``data`` mesh and a 2-D
(dcn, ici) mesh over the same device order give identical ids.
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

from ..ops.topk import flat_topk


def dcn_mesh(devices=None, n_dcn: int = 2) -> Mesh:
    """(dcn, ici) mesh: ``n_dcn`` slices × (n_devices/n_dcn) chips."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_dcn != 0:
        raise ValueError(f"{n} devices not divisible by n_dcn={n_dcn}")
    grid = np.asarray(devices).reshape(n_dcn, n // n_dcn)
    return Mesh(grid, axis_names=("dcn", "ici"))


def shard_corpus_dcn(corpus: jax.Array, mesh: Mesh) -> jax.Array:
    """Row-shard a padded [N, D] corpus over BOTH mesh axes."""
    n_shards = mesh.shape["dcn"] * mesh.shape["ici"]
    n = corpus.shape[0]
    if n % n_shards != 0:
        pad = n_shards * (-(-n // n_shards)) - n
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return jax.device_put(
        corpus, NamedSharding(mesh, P(("dcn", "ici"), None))
    )


def hierarchical_flat_topk(
    queries: jax.Array,
    corpus: jax.Array,  # [N_pad, D] sharded P(("dcn","ici"), None)
    k: int,
    mesh: Mesh,
    *,
    valid_n: int | None = None,
    block_n: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """Global exact top-k with a two-stage merge: ICI all-gather + top-k
    within each slice, then DCN all-gather + top-k across slices. Each
    stage keeps only k survivors, so DCN traffic is k·n_dcn instead of
    the flat merge's k·n_shards. Returns (scores [Q,k], global rows)."""
    n = corpus.shape[0]
    n_dcn, n_ici = mesh.shape["dcn"], mesh.shape["ici"]
    n_shards = n_dcn * n_ici
    shard_rows = n // n_shards
    if valid_n is None:
        valid_n = n
    k = min(k, valid_n)
    k_local = min(k, shard_rows)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(("dcn", "ici"), None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(q, local_corpus):
        di = jax.lax.axis_index("dcn")
        ii = jax.lax.axis_index("ici")
        shard_idx = di * n_ici + ii
        start = shard_idx * shard_rows
        local_valid = jnp.clip(valid_n - start, 0, shard_rows)
        local_vals, local_rows = flat_topk(
            q, local_corpus, k_local, metric="ip",
            block_n=min(block_n, shard_rows), valid_n=local_valid,
        )
        invalid = ~jnp.isfinite(local_vals)
        gids = jnp.where(invalid, -1, local_rows + start)
        local_vals = jnp.where(invalid, -jnp.inf, local_vals)
        # stage 1: merge within the slice (fast ICI links)
        iv = jax.lax.all_gather(local_vals, "ici", axis=1, tiled=True)
        ir = jax.lax.all_gather(gids, "ici", axis=1, tiled=True)
        sv, sp = jax.lax.top_k(iv, min(k, iv.shape[1]))
        sr = jnp.take_along_axis(ir, sp, axis=1)
        # stage 2: merge across slices (k survivors per slice over DCN)
        dv = jax.lax.all_gather(sv, "dcn", axis=1, tiled=True)
        dr = jax.lax.all_gather(sr, "dcn", axis=1, tiled=True)
        fv, fp = jax.lax.top_k(dv, min(k, dv.shape[1]))
        fr = jnp.take_along_axis(dr, fp, axis=1)
        return fv, fr

    return search(queries, corpus)


def hierarchical_kmeans(
    points: jax.Array,  # [N_pad, D] sharded P(("dcn","ici"), None)
    k: int,
    mesh: Mesh,
    *,
    valid_n: int | None = None,
    iters: int = 10,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd over a 2-level mesh: per-shard assignment, centroid sums
    psum'd over ICI first then DCN (two-stage reduction — the ICI psum
    shrinks per-slice statistics to [K, D] before anything crosses DCN;
    cost over DCN is K·D per iteration regardless of corpus size).
    Returns (centroids [K, D] replicated, assignments sharded)."""
    from ..ops.kmeans import _kmeans_pp_init

    n, d = points.shape
    n_dcn, n_ici = mesh.shape["dcn"], mesh.shape["ici"]
    n_shards = n_dcn * n_ici
    shard_rows = n // n_shards
    if valid_n is None:
        valid_n = n

    sample_rows = min(valid_n, max(4 * k, 4096))
    init = _kmeans_pp_init(
        jnp.asarray(points[:sample_rows]), k, jax.random.PRNGKey(seed)
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(("dcn", "ici"), None), P(None, None)),
        out_specs=(P(None, None), P(("dcn", "ici"))),
        check_vma=False,
    )
    def one_iter(local_points, centroids):
        di = jax.lax.axis_index("dcn")
        ii = jax.lax.axis_index("ici")
        shard_idx = di * n_ici + ii
        start = shard_idx * shard_rows
        local_valid = jnp.clip(valid_n - start, 0, shard_rows)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (shard_rows, 1), 0)[:, 0]
        valid_mask = row_ids < local_valid

        c_norms = jnp.sum(centroids**2, axis=1)
        scores = (
            2.0
            * jax.lax.dot_general(
                local_points, centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - c_norms[None, :]
        )
        assign = jnp.argmax(scores, axis=1).astype(jnp.int32)
        one_hot = jnp.where(
            valid_mask[:, None],
            jax.nn.one_hot(assign, k, dtype=jnp.float32),
            0.0,
        )
        sums = jax.lax.dot_general(
            one_hot, local_points.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(one_hot, axis=0)
        # two-stage reduction: ICI first, then DCN
        sums = jax.lax.psum(jax.lax.psum(sums, "ici"), "dcn")
        counts = jax.lax.psum(jax.lax.psum(counts, "ici"), "dcn")
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        new_centroids = jnp.where(
            (counts < 0.5)[:, None], centroids, new_centroids
        )
        return new_centroids, jnp.where(valid_mask, assign, -1)

    one_iter_jit = jax.jit(one_iter)
    centroids = init
    assignments = None
    for _ in range(iters):
        centroids, assignments = one_iter_jit(points, centroids)
    return centroids, assignments
