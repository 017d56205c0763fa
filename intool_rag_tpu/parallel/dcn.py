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


def _two_level_merge(local_vals, gids, k):
    """Hierarchical candidate merge: ICI all-gather + top-k within the
    slice, then k survivors per slice across DCN (k·n_dcn traffic on the
    slow axis instead of k·n_shards)."""
    iv = jax.lax.all_gather(local_vals, "ici", axis=1, tiled=True)
    ir = jax.lax.all_gather(gids, "ici", axis=1, tiled=True)
    sv, sp = jax.lax.top_k(iv, min(k, iv.shape[1]))
    sr = jnp.take_along_axis(ir, sp, axis=1)
    dv = jax.lax.all_gather(sv, "dcn", axis=1, tiled=True)
    dr = jax.lax.all_gather(sr, "dcn", axis=1, tiled=True)
    fv, fp = jax.lax.top_k(dv, min(k, dv.shape[1]))
    fr = jnp.take_along_axis(dr, fp, axis=1)
    return fv, fr


def _hierarchical_search(queries, arrays, specs, k, mesh, counts, local_topk):
    """Generic 2-level sharded search: ``local_topk(q, locals_,
    local_valid, shard_idx)`` returns the per-shard ``(vals, rows)``
    in LOCAL slot ids; rows map to interleaved global ids
    (slot·n_shards + shard — the ShardedCorpus convention) and merge
    hierarchically. ``counts`` is the per-shard valid-row vector."""
    n_dcn, n_ici = mesh.shape["dcn"], mesh.shape["ici"]
    n_shards = n_dcn * n_ici
    counts_arr = jnp.asarray(counts, jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None),) + tuple(specs),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(q, *locals_):
        di = jax.lax.axis_index("dcn")
        ii = jax.lax.axis_index("ici")
        shard_idx = di * n_ici + ii
        local_valid = counts_arr[shard_idx]
        local_vals, local_rows = local_topk(q, locals_, local_valid, shard_idx)
        invalid = ~jnp.isfinite(local_vals)
        local_vals = jnp.where(invalid, -jnp.inf, local_vals)
        gids = jnp.where(invalid, -1, local_rows * n_shards + shard_idx)
        return _two_level_merge(local_vals, gids, k)

    return search(queries, *arrays)


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


# ---------------- hybrid (dense + BM25 + fusion) on the 2-level mesh ----------------


def hierarchical_corpus_topk(corpus, queries, k, mesh, *, group_l=None,
                             tail="fold", kernel=None):
    """Dense top-k over a :class:`ShardedCorpus`'s planes with the
    hierarchical (ICI-then-DCN) merge. The per-shard selection runs the
    SAME fused kernels as the 1-D path (Pallas bf16/f32 or
    int8(+residual); XLA scan fallback) — only the merge topology
    differs, so scores equal the 1-D sharded engine's exactly."""
    from ..ops.flat_pallas import flat_topk_pallas, flat_topk_pallas_int8
    from .sharded_search import pallas_group_l

    n_shards = mesh.shape["dcn"] * mesh.shape["ici"]
    assert n_shards == corpus.n_shards, (
        f"corpus sharded {corpus.n_shards}-way; mesh has {n_shards} shards"
    )
    k = min(k, corpus.cap * n_shards)
    k_local = min(k, corpus.cap)
    if corpus.quant != "none":
        if queries.shape[1] != corpus.dim_pad:
            queries = jnp.pad(
                queries, ((0, 0), (0, corpus.dim_pad - queries.shape[1]))
            )
        g = group_l if group_l is not None else pallas_group_l(corpus.cap, k_local)
        interp = corpus._interpret()
        with_res = corpus.res is not None
        arrays = (corpus.codes, corpus.scales) + (
            (corpus.res,) if with_res else ()
        )
        specs = (P(("dcn", "ici"), None), P(("dcn", "ici"))) + (
            (P(("dcn", "ici"), None),) if with_res else ()
        )

        def local_topk(q, locals_, valid, sid):
            return flat_topk_pallas_int8(
                q, locals_[0], locals_[1], k_local,
                corpus_res=locals_[2] if with_res else None,
                group_l=g, valid_n=valid, tail=tail, interpret=interp,
            )

    else:
        if kernel is None:
            kernel = (
                "pallas"
                if jax.default_backend() == "tpu"
                and pallas_group_l(corpus.cap, k_local) is not None
                else "xla"
            )
        arrays = (corpus.data,)
        specs = (P(("dcn", "ici"), None),)
        if kernel == "pallas":
            g = group_l if group_l is not None else pallas_group_l(corpus.cap, k_local)
            interp = corpus._interpret()

            def local_topk(q, locals_, valid, sid):
                return flat_topk_pallas(
                    q, locals_[0], k_local, group_l=g, valid_n=valid,
                    precise=locals_[0].dtype == jnp.bfloat16,
                    tail=tail, interpret=interp,
                )

        else:

            def local_topk(q, locals_, valid, sid):
                return flat_topk(
                    q, locals_[0], k_local, metric="ip",
                    block_n=min(16384, corpus.cap), valid_n=valid,
                )

    return _hierarchical_search(
        queries, arrays, specs, k, mesh, corpus.counts, local_topk
    )


def hierarchical_bm25_topk(bm25, queries: list[str], k: int, mesh: Mesh):
    """Sparse top-k over a :class:`ShardedBM25`'s postings with the
    hierarchical merge (same per-shard row kernels, same global
    quantization grid — scores equal the 1-D sharded path's)."""
    from ..ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed

    qterms, qtf = bm25.encode_queries(queries)
    tr, th, hd, hw, cd, cw, idf, wmax = bm25.device_arrays()
    cap = bm25._cap
    n_dcn, n_ici = mesh.shape["dcn"], mesh.shape["ici"]
    n_shards = n_dcn * n_ici
    k_eff = min(k, cap * n_shards)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None), P(None, None),
            P(("dcn", "ici"), None), P(("dcn", "ici"), None),
            P(("dcn", "ici"), None, None), P(("dcn", "ici"), None, None),
            P(("dcn", "ici"), None, None), P(("dcn", "ici"), None, None),
            P(None), P(None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(qt, qf, tr_, th_, hd_, hw_, cd_, cw_, idf_r, wmax_r):
        di = jax.lax.axis_index("dcn")
        ii = jax.lax.axis_index("ici")
        shard = di * n_ici + ii
        if cap < 1 << 20:
            vals, slots = bm25_topk_rows_packed(
                qt, qf, tr_[0], th_[0], hd_[0], hw_[0], cd_[0], cw_[0],
                idf_r, k_eff, n_docs=cap, term_wmax=wmax_r,
            )
        else:
            vals, slots = bm25_topk_rows(
                qt, qf, tr_[0], th_[0], hd_[0], hw_[0], cd_[0], cw_[0],
                idf_r, k_eff, n_docs=cap,
            )
        invalid = vals <= 0.0
        gids = jnp.where(invalid, -1, slots * n_shards + shard)
        vals = jnp.where(invalid, -jnp.inf, vals)
        top_vals, top_gids = _two_level_merge(vals, gids, k_eff)
        finite = jnp.isfinite(top_vals)
        return (
            jnp.where(finite, top_vals, 0.0),
            jnp.where(finite, top_gids, -1),
        )

    return search(qterms, qtf, tr, th, hd, hw, cd, cw, idf, wmax)


class DCNHybrid:
    """Hybrid (dense + BM25 + fusion) corpus on a 2-level (dcn, ici)
    mesh — BASELINE config #5's multi-slice story matching the
    single-slice :class:`~intool_rag_tpu.parallel.sharded_hybrid.ShardedHybrid`
    (round-3 verdict item 9). Storage reuses the 1-D machinery over the
    flattened device order (identical physical placement and identical
    interleaved row ids — see the module docstring), so only the query
    collectives change: both retriever families merge ICI-first, and
    fusion runs on the replicated merged lists."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        *,
        capacity_per_shard: int = 1024,
        dtype=jnp.float32,
        params=None,
        quant: str = "none",
        interpret: bool | None = None,
    ) -> None:
        from .mesh import corpus_mesh
        from .sharded_bm25 import ShardedBM25
        from .sharded_corpus import ShardedCorpus

        self.mesh = mesh
        flat = corpus_mesh(list(mesh.devices.reshape(-1)))
        self.corpus = ShardedCorpus(
            dim, flat, capacity_per_shard=capacity_per_shard, dtype=dtype,
            quant=quant, interpret=interpret,
        )
        self.bm25 = ShardedBM25(flat, params=params)

    @property
    def valid_n(self) -> int:
        return self.corpus.valid_n

    def append(self, texts: list[str], embeddings: np.ndarray) -> np.ndarray:
        if len(texts) != embeddings.shape[0]:
            raise ValueError(
                f"texts ({len(texts)}) and embeddings "
                f"({embeddings.shape[0]}) must align"
            )
        gids = self.corpus.append(embeddings)
        n = self.corpus.n_shards
        self.bm25.append(
            texts,
            dest_shard=(gids % n).astype(np.int32),
            dest_slot=(gids // n).astype(np.int32),
            cap=self.corpus.cap,
        )
        return gids

    def search(
        self,
        query_texts: list[str],
        query_embeddings,
        k: int,
        *,
        candidates: int | None = None,
        hybrid: bool | None = None,
        group_l: int | None = None,
        tail: str = "fold",
    ):
        """Fused ``(scores [Q, k], global row ids [Q, k])`` — same
        config surface and fusion modes as ShardedHybrid.search."""
        from ..config import get_config
        from ..ops.fusion import normalize_minmax, rrf_fusion, weighted_fusion

        cfg = get_config()
        if self.valid_n == 0:
            q = len(query_texts)
            return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
        kc = min(
            candidates or max(k, cfg.RETRIEVAL_CANDIDATES), self.valid_n
        )
        k = min(k, kc)
        use_hybrid = cfg.HYBRID_SEARCH_ENABLED if hybrid is None else hybrid

        d_vals, d_rows = hierarchical_corpus_topk(
            self.corpus, query_embeddings, kc, self.mesh,
            group_l=group_l, tail=tail,
        )
        d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
        if not use_hybrid:
            return d_vals[:, :k], d_rows[:, :k]

        s_vals, s_rows = hierarchical_bm25_topk(
            self.bm25, query_texts, kc, self.mesh
        )
        if cfg.FUSION_MODE == "rrf":
            return rrf_fusion(d_rows, s_rows, k, rrf_k=cfg.RRF_K)
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        return weighted_fusion(
            d_rows, d_vals, s_rows, s_norm, k,
            w_dense=cfg.VECTOR_WEIGHT, w_sparse=cfg.BM25_WEIGHT,
        )
