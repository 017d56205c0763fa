"""Device k-means for IVF coarse quantizer training.

Replaces FAISS's C++ k-means (the reference never partitions — it uses
exact IndexFlatL2 only, faiss_index.py:123; IVF is part of the declared
scale-out capability per BASELINE.md config #3).

Design: Lloyd iterations entirely on device —
- assignment: blockwise over points; one MXU matmul per block against the
  centroid matrix (argmax of 2·x·c − |c|², the L2 trick), no [N, K]
  materialization beyond a block;
- update: one-hot matmul accumulation (segment-sum as MXU work, not
  scatter) of per-block sums and counts;
- empty clusters reseed from the largest cluster's points with a small
  deterministic perturbation.

The distributed variant shards points over the ``data`` mesh axis and
psums the per-block (sums, counts) — see
``intool_rag_tpu.parallel.sharded_kmeans``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block_n",))
def assign_blockwise(
    points: jax.Array,  # [N, D]
    centroids: jax.Array,  # [K, D]
    *,
    block_n: int = 65_536,
) -> jax.Array:
    """Nearest-centroid assignment [N] i32 (squared-L2)."""
    n, d = points.shape
    block_n = min(block_n, n)
    num_blocks = -(-n // block_n)
    padded = num_blocks * block_n
    if padded != n:
        points = jnp.pad(points, ((0, padded - n), (0, 0)))
    c_norms = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)

    def body(_, block_idx):
        block = jax.lax.dynamic_slice(
            points, (block_idx * block_n, 0), (block_n, d)
        )
        scores = (
            2.0
            * jax.lax.dot_general(
                block,
                centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - c_norms[None, :]
        )
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(body, None, jnp.arange(num_blocks))
    return assigns.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def update_centroids(
    points: jax.Array, assignments: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Returns (sums [K, D] f32, counts [K] f32) via one-hot matmul."""
    one_hot = jax.nn.one_hot(assignments, k, dtype=jnp.float32)  # [N, K]
    sums = jax.lax.dot_general(
        one_hot,
        points.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, D]
    counts = jnp.sum(one_hot, axis=0)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("block_n",))
def lloyd_step_blockwise(
    points: jax.Array,  # [N, D]
    centroids: jax.Array,  # [K, D] f32
    *,
    block_n: int = 16_384,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fused Lloyd iteration: blockwise assignment + accumulation.

    Returns (assignments [N] i32, sums [K, D] f32, counts [K] f32)
    reading the corpus once and never materializing more than a
    [block_n, K] one-hot — the [N, K] matrix is 16 GB at N=1M, K=4096,
    which is what blocks the 1M-corpus IVF build otherwise."""
    n, d = points.shape
    k = centroids.shape[0]
    block_n = min(block_n, n)
    num_blocks = -(-n // block_n)
    padded = num_blocks * block_n
    if padded != n:
        points = jnp.pad(points, ((0, padded - n), (0, 0)))
    c_norms = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=1)

    def body(carry, block_idx):
        sums, counts = carry
        block = jax.lax.dynamic_slice(
            points, (block_idx * block_n, 0), (block_n, d)
        )
        scores = (
            2.0
            * jax.lax.dot_general(
                block,
                centroids,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - c_norms[None, :]
        )
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        valid = (block_idx * block_n + jnp.arange(block_n)) < n
        one_hot = jax.nn.one_hot(a, k, dtype=jnp.float32) * valid[:, None]
        sums = sums + jax.lax.dot_general(
            one_hot,
            block.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(one_hot, axis=0)
        return (sums, counts), a

    (sums, counts), assigns = jax.lax.scan(
        body,
        (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
        jnp.arange(num_blocks),
    )
    return assigns.reshape(-1)[:n], sums, counts


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeans_pp_init(sample: jax.Array, k: int, rng: jax.Array) -> jax.Array:
    """Farthest-point (maxmin) seeding on a subsample: each next seed is
    the point with the largest distance to the chosen set. Deterministic
    given the first pick; guarantees coverage of separated clusters
    (plain D² sampling misses clusters at realistic scales — observed
    14/16 coverage on synthetic separated data). Lloyd refinement then
    smooths any outlier seeds."""
    s, d = sample.shape
    sample_f = sample.astype(jnp.float32)
    first = jax.random.randint(rng, (), 0, s)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(sample_f[first])
    min_d0 = jnp.sum((sample_f - sample_f[first]) ** 2, axis=1)

    def step(carry, i):
        centroids, min_d = carry
        idx = jnp.argmax(min_d)
        c = sample_f[idx]
        centroids = centroids.at[i].set(c)
        min_d = jnp.minimum(min_d, jnp.sum((sample_f - c) ** 2, axis=1))
        return (centroids, min_d), None

    (centroids, _), _ = jax.lax.scan(
        step, (centroids0, min_d0), jnp.arange(1, k)
    )
    return centroids


def kmeans(
    points: jax.Array,
    k: int,
    *,
    iters: int = 10,
    seed: int = 0,
    block_n: int = 65_536,
    init_sample: int = 16_384,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd k-means with k-means++ init (on a subsample for large N).
    Returns (centroids [K, D] f32, assignments [N] i32)."""
    n, d = points.shape
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    rng = jax.random.PRNGKey(seed)
    s = min(n, max(init_sample, 4 * k))
    sample_idx = jax.random.choice(rng, n, shape=(s,), replace=False)
    centroids = _kmeans_pp_init(
        points[sample_idx], k, jax.random.fold_in(rng, 987_654)
    )

    for i in range(iters):
        _, sums, counts = lloyd_step_blockwise(
            points, centroids, block_n=min(block_n, 16_384)
        )
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        # reseed empties: perturb the centroid of the largest cluster
        empty = counts < 0.5
        biggest = jnp.argmax(counts)
        jitter = (
            jax.random.normal(jax.random.fold_in(rng, i), (k, d)) * 1e-3
        )
        reseed = new_centroids[biggest][None, :] + jitter
        centroids = jnp.where(empty[:, None], reseed, new_centroids)

    assignments = assign_blockwise(points, centroids, block_n=block_n)
    return centroids, assignments
