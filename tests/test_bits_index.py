"""List-major binary-residual capacity index (index/bits_index.py +
ops/bits_pallas.py) — oracle-parity, spill, streaming, refine, and
persistence tests on the CPU backend (kernel in interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intool_rag_tpu.index.bits_index import IVFBitsIndex
from intool_rag_tpu.ops.bits_pallas import (
    decode_bits_planar,
    encode_bits_planar,
    ivf_bits_topk_pallas,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _clustered(rng, n, d, l, noise=0.05):
    """Clusters with per-row radius SPREAD (log-uniform 0.2–2× base):
    equal radii put every cluster member at the same distance from a
    query, making 'the true top-10' an arbitrary pick among ties that
    no quantized code could reproduce — spread gives real score gaps
    (same reasoning as benchmarks/bench_segmented.py)."""
    centers = rng.standard_normal((l, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = rng.integers(0, l, n)
    radius = noise * np.exp(
        rng.uniform(np.log(0.2), np.log(2.0), (n, 1))
    ).astype(np.float32)
    x = centers[ids] + radius * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_encode_decode_planar_roundtrip(rng):
    x = rng.standard_normal((64, 256)).astype(np.float32)
    codes, scales = encode_bits_planar(jnp.asarray(x))
    assert codes.shape == (64, 32) and codes.dtype == jnp.uint8
    assert scales.shape == (64, 8)
    xhat = np.asarray(decode_bits_planar(codes, scales))
    # signs must match exactly; magnitude is the per-plane mean |x|
    assert np.all(np.sign(xhat) == np.where(x >= 0, 1.0, -1.0))
    w = 256 // 8
    for b in range(8):
        want = np.abs(x[:, b * w : (b + 1) * w]).mean(axis=1)
        np.testing.assert_allclose(
            np.abs(xhat[:, b * w]), want, rtol=1e-5
        )
    # sign-quantizer quality: q·x̂ correlates strongly with q·x
    q = rng.standard_normal((8, 256)).astype(np.float32)
    corr = np.corrcoef((q @ x.T).ravel(), (q @ xhat.T).ravel())[0, 1]
    assert corr > 0.75


def test_bits_kernel_matches_decode_oracle(rng):
    """Kernel scores must equal q·c_list + q·decode(codes) for probed
    slots (exact arithmetic parity with the decode oracle)."""
    d, l, block_n, bpl = 256, 4, 32, 2
    cap_l = block_n * bpl
    n_cap = l * cap_l
    centroids = rng.standard_normal((l, d)).astype(np.float32)
    # fill every slot with a real row (no empties in this test)
    resid = 0.1 * rng.standard_normal((n_cap, d)).astype(np.float32)
    codes, scales = encode_bits_planar(jnp.asarray(resid))
    queries = rng.standard_normal((8, d)).astype(np.float32)
    c_scores = queries @ centroids.T
    probes = np.argsort(-c_scores.sum(0))[None, :2].astype(np.int32)  # [1, 2]
    c_sel = np.take_along_axis(c_scores, np.repeat(probes, 8, 0), axis=1)
    # group_l=1: no partial reduce, so the kernel's candidate set is the
    # full probed region and selection must match the oracle exactly
    # block-major scales: [n_blocks, 8, block_n]
    sc_bm = jnp.asarray(
        np.asarray(scales).T.reshape(8, n_cap // block_n, block_n)
    ).transpose(1, 0, 2)
    vals, slots = ivf_bits_topk_pallas(
        jnp.asarray(queries), codes, sc_bm,
        jnp.asarray(probes * bpl), jnp.asarray(c_sel),
        16, blocks_per_list=bpl, block_n=block_n, group_l=1,
        interpret=True, tail="exact",
    )
    # oracle over the probed slots only
    xhat = np.asarray(decode_bits_planar(codes, scales))
    slot_ids = np.concatenate(
        [np.arange(p * cap_l, (p + 1) * cap_l) for p in probes[0]]
    )
    lists = slot_ids // cap_l
    # bf16 queries in-kernel: compare against the bf16-rounded product
    qb = np.asarray(jnp.asarray(queries).astype(jnp.bfloat16).astype(jnp.float32))
    oracle = qb @ xhat[slot_ids].T + c_scores[:, lists]
    want_order = np.argsort(-oracle, axis=1)[:, :16]
    got_v = np.asarray(vals)
    got_s = np.asarray(slots)
    for qi in range(8):
        want_slots = slot_ids[want_order[qi]]
        assert set(got_s[qi].tolist()) == set(want_slots.tolist())
        np.testing.assert_allclose(
            got_v[qi], np.sort(oracle[qi])[::-1][:16], rtol=2e-2, atol=2e-2
        )


def test_bits_index_recall_and_refine(rng):
    n, d, l = 4096, 256, 16
    x = _clustered(rng, n, d, l)
    idx = IVFBitsIndex.train(
        jnp.asarray(x[:2048]), l, capacity=2 * n, block_n=64, refine=True
    )
    for i in range(0, n, 1024):
        gids = idx.append(jnp.asarray(x[i : i + 1024]))
        assert gids[0] == i and gids[-1] == i + 1023
    assert idx.total_rows == n
    queries = x[rng.integers(0, n, 32)] + 0.01 * rng.standard_normal(
        (32, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    exact = queries @ x.T
    oracle = np.argsort(-exact, axis=1)[:, :10]
    # the refine tier scores in int8 — rank-9/10 near-ties (gaps under
    # int8's ~1e-3 relative error) legitimately swap, so the tight bars
    # compare against the exact-INT8 oracle (same precision class, the
    # bench_10m_int8 convention); the f32-exact bar stays as a loose
    # secondary check
    from intool_rag_tpu.ops.quant import dequantize_int8, quantize_int8

    x8 = np.asarray(dequantize_int8(*quantize_int8(jnp.asarray(x))))
    oracle8 = np.argsort(-(queries @ x8.T), axis=1)[:, :10]
    # binary tier alone: decent pool capture
    _, rows = idx.search(
        jnp.asarray(queries), 100, nprobe=8, group_l=1, interpret=True
    )
    pool = np.asarray(rows)
    pool_hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(pool, oracle)
    )
    assert pool_hits / oracle.size >= 0.9
    # + host-int8 refine: recall@10 limited only by probe coverage —
    # boundary rows (assigned to list B while the query's probes favor
    # A) are the classic IVF loss mode, ~5% at nprobe 8/16 here
    vals, rows = idx.search(
        jnp.asarray(queries), 10, nprobe=8, refine_k=200, group_l=1,
        interpret=True
    )
    got = np.asarray(rows)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(got, oracle)
    )
    assert hits / oracle.size >= 0.90  # vs f32-exact (int8 tie swaps)
    hits8 = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(got, oracle8)
    )
    assert hits8 / oracle8.size >= 0.95  # vs exact-int8 (same precision)
    # scores are the exact int8-refined products, descending
    assert np.all(np.diff(np.asarray(vals), axis=1) <= 1e-6)
    # full probe (nprobe = nlist) removes coverage loss
    _, rows_full = idx.search(
        jnp.asarray(queries), 10, nprobe=l, refine_k=200, group_l=1,
        interpret=True
    )
    got_full = np.asarray(rows_full)
    hits_full = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(got_full, oracle8)
    )
    assert hits_full / oracle8.size >= 0.97


def test_bits_index_tail_modes_agree(rng):
    """The fold-by-2 tail and the blocked exact sort must agree on
    clean-margin data (fold only drops a candidate when its fold
    partner beats it — both are in the same candidate set, so the
    survivor set matches the exact sort up to rare true-top-k pairs
    landing on the same fold lane)."""
    n, d, l = 4096, 256, 16
    x = _clustered(rng, n, d, l)
    idx = IVFBitsIndex.train(
        jnp.asarray(x[:2048]), l, capacity=2 * n, block_n=64, refine=False
    )
    idx.append(jnp.asarray(x))
    queries = x[rng.integers(0, n, 16)] + 0.01 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    out = {}
    for tail in ("fold", "blocked"):
        _, rows = idx.search(
            jnp.asarray(queries), 10, nprobe=8, group_l=1, tail=tail,
            interpret=True,
        )
        out[tail] = np.asarray(rows)
    # top-1 identical; set overlap >= 0.9 (fold pair-collisions only)
    assert np.array_equal(out["fold"][:, 0], out["blocked"][:, 0])
    overlap = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(out["fold"], out["blocked"])
    )
    assert overlap / out["fold"].size >= 0.9


def test_bits_index_spill_and_capacity(rng):
    """Skewed appends spill to next-nearest lists without dropping rows;
    exceeding capacity raises."""
    d, l = 64, 4
    centroids = np.eye(l, d).astype(np.float32)
    idx = IVFBitsIndex(
        jnp.asarray(centroids), capacity=64, block_n=8, refine=False
    )
    assert idx.cap_l == 16
    # 40 rows all nearest to centroid 0 → must spill beyond list 0
    x = np.tile(centroids[0], (40, 1)) + 0.01 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    idx.append(jnp.asarray(x))
    assert idx.total_rows == 40
    assert idx.fill[0] == 16 and idx.fill.sum() == 40
    # every row still findable (scan all lists)
    _, rows = idx.search(jnp.asarray(x[:8]), 1, nprobe=l, interpret=True)
    got = np.asarray(rows)[:, 0]
    assert (got >= 0).all()
    # exceeding total capacity raises
    with pytest.raises(ValueError, match="full"):
        idx.append(jnp.asarray(rng.standard_normal((40, d)).astype(np.float32)))


def test_bits_index_save_load_roundtrip(rng, tmp_path):
    n, d, l = 512, 128, 8
    x = _clustered(rng, n, d, l)
    idx = IVFBitsIndex.train(
        jnp.asarray(x), l, capacity=2 * n, block_n=16, refine=True
    )
    idx.append(jnp.asarray(x))
    path = tmp_path / "bits.npz"
    idx.save(path)
    idx2 = IVFBitsIndex.load(path)
    assert idx2.total_rows == n
    q = jnp.asarray(x[:8])
    v1, r1 = idx.search(q, 5, nprobe=4, refine_k=20, interpret=True)
    v2, r2 = idx2.search(q, 5, nprobe=4, refine_k=20, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_index_kind_bits_routing(rng, monkeypatch):
    """INDEX_KIND=bits routes DenseFlatIndex.search through the bits
    tier with true incremental appends (registry parity with the
    segmented kind)."""
    monkeypatch.setenv("INDEX_KIND", "bits")
    monkeypatch.setenv("IVF_NLIST", "8")
    monkeypatch.setenv("IVF_NPROBE", "8")
    monkeypatch.setenv("IVF_REFINE_K", "64")
    from intool_rag_tpu.config import reset_config
    from intool_rag_tpu.index.chunk_store import ChunkStore
    from intool_rag_tpu.index.flat_index import DenseFlatIndex

    reset_config()
    try:
        d = 128
        x = _clustered(rng, 8192, d, 8, noise=0.05)
        store = ChunkStore(dim=d, dtype="float32")
        idx = DenseFlatIndex(store)
        store.append(
            x[:4096], "doc0",
            [f"c{i}" for i in range(4096)],
            list(range(4096)),
            [f"t{i}" for i in range(4096)],
        )
        # force the bits tier to build (valid_n >= _IVF_MIN_ROWS)
        q = jnp.asarray(x[:16])
        vals, rows = idx.search(q, 5)
        from intool_rag_tpu.index.bits_index import IVFBitsIndex

        assert isinstance(idx._ivf, IVFBitsIndex)
        built = idx._ivf
        assert built.total_rows == 4096
        # incremental append: same bits index object grows, no rebuild
        store.append(
            x[4096:8192], "doc1",
            [f"c{i}" for i in range(4096, 8192)],
            list(range(4096)),
            [f"t{i}" for i in range(4096, 8192)],
        )
        vals, rows = idx.search(q, 5)
        assert idx._ivf is built and built.total_rows == 8192
        # each query's own row must come back first (queries are corpus rows)
        got = np.asarray(rows)[:, 0]
        assert (got == np.arange(16)).mean() >= 0.9
    finally:
        reset_config()
