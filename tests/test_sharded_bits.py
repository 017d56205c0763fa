"""ShardedBits (parallel/sharded_bits.py): the binary-residual capacity
tier composed with the mesh (round-4 verdict item 6). CPU mesh, kernel
in interpret mode; exactness from group_l=1 + tail="exact" (same
convention as tests/test_sharded_kernels.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intool_rag_tpu.index.bits_index import IVFBitsIndex
from intool_rag_tpu.parallel.mesh import corpus_mesh
from intool_rag_tpu.parallel.sharded_bits import ShardedBitsIndex

N_DEV = 4
D = 256
L = 16


@pytest.fixture
def mesh():
    return corpus_mesh(jax.devices()[:N_DEV])


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _clustered(rng, n, d, l, noise=0.05):
    centers = rng.standard_normal((l, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = rng.integers(0, l, n)
    radius = noise * np.exp(
        rng.uniform(np.log(0.2), np.log(2.0), (n, 1))
    ).astype(np.float32)
    x = centers[ids] + radius * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def _build_pair(rng, mesh, n):
    """Single-chip and sharded indices over the SAME centroids + rows."""
    x = _clustered(rng, n, D, L)
    single = IVFBitsIndex.train(
        jnp.asarray(x[: n // 2]), L, capacity=2 * n, block_n=64,
        refine=False,
    )
    sharded = ShardedBitsIndex(
        single.centroids, mesh, capacity=2 * n, block_n=64
    )
    for i in range(0, n, 1024):
        g1 = single.append(jnp.asarray(x[i : i + 1024]))
        g2 = sharded.append(jnp.asarray(x[i : i + 1024]))
        np.testing.assert_array_equal(g1, g2)
    return x, single, sharded


def _queries(rng, x, q=32):
    queries = x[rng.integers(0, len(x), q)] + 0.01 * rng.standard_normal(
        (q, D)
    ).astype(np.float32)
    return queries / np.linalg.norm(queries, axis=1, keepdims=True)


def test_sharded_bits_matches_single_chip(rng, mesh):
    """Same rows, same centroids, exact selection (group_l=1/"exact"):
    the sharded store must return the same top-k sets and scores as the
    single-chip bits index — sub-shard placement is score-invariant."""
    n = 4096
    x, single, sharded = _build_pair(rng, mesh, n)
    assert sharded.total_rows == n
    # per-list row population identical (placement policy parity)
    np.testing.assert_array_equal(
        single.fill, sharded.fill.sum(axis=1)
    )
    queries = _queries(rng, x)
    v1, r1 = single.search(
        jnp.asarray(queries), 10, nprobe=8, group_l=1, tail="exact",
        interpret=True,
    )
    v2, r2 = sharded.search(
        jnp.asarray(queries), 10, nprobe=8, group_l=1, tail="exact",
        interpret=True,
    )
    v1, r1, v2, r2 = map(np.asarray, (v1, r1, v2, r2))
    overlap = 0
    for a, b in zip(r1, r2):
        overlap += len(set(a.tolist()) & set(b.tolist()))
    # identical candidate pools + exact scores → sets match up to
    # score ties at rank k
    assert overlap / r1.size >= 0.95, overlap / r1.size
    np.testing.assert_allclose(
        np.sort(v2, axis=1), np.sort(v1, axis=1), rtol=2e-2, atol=2e-2
    )


def test_sharded_bits_recall_vs_oracle(rng, mesh):
    n = 4096
    x, _, sharded = _build_pair(rng, mesh, n)
    queries = _queries(rng, x)
    exact = queries @ x.T
    oracle = np.argsort(-exact, axis=1)[:, :10]
    _, rows = sharded.search(
        jnp.asarray(queries), 100, nprobe=8, group_l=1, tail="exact",
        interpret=True,
    )
    pool = np.asarray(rows)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(pool, oracle)
    )
    assert hits / oracle.size >= 0.9, hits / oracle.size


def test_sharded_bits_spill_and_balance(rng, mesh):
    """A skewed batch spills to later centroid choices instead of
    failing, and sub-shard placement stays balanced."""
    centers = rng.standard_normal((4, D)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    idx = ShardedBitsIndex(
        jnp.asarray(centers), mesh, capacity=4 * 4 * 64, block_n=64
    )
    # every row near center 0 — list 0 fills (cap_l = 4·64 = 256),
    # overflow spills to choices 2..4
    rows = centers[0] + 0.01 * rng.standard_normal((300, D)).astype(
        np.float32
    )
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    gids = idx.append(jnp.asarray(rows))
    assert idx.total_rows == 300 and len(gids) == 300
    assert idx.fill.sum() == 300
    assert idx.fill[0].sum() == 256  # home list filled to capacity
    # shard balance within the full list: exactly cap_ls each
    np.testing.assert_array_equal(idx.fill[0], [64, 64, 64, 64])
    # every appended row is findable at full probe
    queries = rows[:8]
    _, got = idx.search(
        jnp.asarray(queries), 10, nprobe=4, group_l=1, tail="exact",
        interpret=True,
    )
    got = np.asarray(got)
    assert (got >= 0).all()


def test_sharded_bits_save_load_roundtrip(rng, mesh, tmp_path):
    n = 2048
    x, _, sharded = _build_pair(rng, mesh, n)
    path = tmp_path / "bits_sharded.npz"
    sharded.save(path)
    loaded = ShardedBitsIndex.load(path, mesh)
    assert loaded.total_rows == sharded.total_rows
    np.testing.assert_array_equal(loaded.fill, sharded.fill)
    queries = _queries(rng, x, q=16)
    v1, r1 = sharded.search(
        jnp.asarray(queries), 10, nprobe=8, group_l=1, tail="exact",
        interpret=True,
    )
    v2, r2 = loaded.search(
        jnp.asarray(queries), 10, nprobe=8, group_l=1, tail="exact",
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # mesh-shape mismatch is a hard error
    bad = corpus_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="sharded"):
        ShardedBitsIndex.load(path, bad)
