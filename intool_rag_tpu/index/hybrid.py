"""Hybrid retrieval engine: dense + BM25 + fusion in one query program.

Implements the hybrid capability the reference declares but never built
(rag/config.py:43-45, README.md:54-58; SURVEY.md §0). Dense candidates
come from the flat (or IVF) index, sparse candidates from the BM25
postings kernel; fusion is weighted (default, VECTOR_WEIGHT/BM25_WEIGHT)
or RRF per ``FUSION_MODE``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import get_config
from ..ops.fusion import normalize_minmax, rrf_fusion, weighted_fusion
from .bm25_index import BM25Index, bm25_dispatch
from .chunk_store import ChunkStore
from .flat_index import DenseFlatIndex, dense_dispatch


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "kc", "fusion_mode", "rrf_k",
        "kind", "metric", "valid_n", "group_l", "precise", "block_n",
        "use_approx", "rescore", "packed", "n_docs", "hot_cap",
    ),
)
def _fused_hybrid_search(
    q_emb,
    dense_arrays,
    qt,
    qf,
    bm25_arrays,
    w_dense,
    w_sparse,
    *,
    k: int,
    kc: int,
    fusion_mode: str,
    rrf_k: int,
    kind: str,
    metric: str,
    valid_n: int,
    group_l: int = 32,
    precise: bool = True,
    block_n: int = 0,
    use_approx: bool = False,
    rescore: bool = False,
    packed: bool = True,
    hot_cap: int | None = None,
    n_docs: int = 0,
):
    """Dense + BM25 + fusion as ONE compiled program (SURVEY §3.2's
    "collapse into one XLA program", applied to the serving path).

    Separately-jitted stages plus their eager glue cost ~10 device
    dispatches per search; on the TPU tunnel each dispatch is ~40 ms of
    RPC, which made a single /search ~2 s (round-5 measurement through
    bench_http). Here the flat dense kernel, the BM25 postings kernel,
    sanitization, normalization, and fusion inline into one launch.
    Corpus data arrives as arguments (jit closures over device arrays
    embed them in the executable and stall remote compile)."""
    dim_pad = dense_arrays[0].shape[1]
    if q_emb.shape[1] < dim_pad:
        q_emb = jnp.pad(q_emb, ((0, 0), (0, dim_pad - q_emb.shape[1])))
    d_vals, d_rows = dense_dispatch(
        q_emb, dense_arrays, kind=kind, k=kc, metric=metric,
        valid_n=valid_n, group_l=group_l, precise=precise,
        block_n=block_n, use_approx=use_approx, rescore=rescore,
    )
    # sanitize: candidates that are padding (-inf dense score) or
    # no-match BM25 rows (score 0) become id -1, which fusion masks.
    d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
    s_vals, s_rows = bm25_dispatch(
        qt, qf, bm25_arrays, k=kc, packed=packed, n_docs=n_docs,
        hot_cap=hot_cap,
    )
    s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
    if fusion_mode == "rrf":
        return rrf_fusion(d_rows, s_rows, k, rrf_k=rrf_k)
    s_norm = normalize_minmax(s_vals)
    d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
    s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
    return weighted_fusion(
        d_rows, d_vals, s_rows, s_norm, k,
        w_dense=w_dense, w_sparse=w_sparse,
    )


class HybridEngine:
    """Corpus-wide hybrid search over a ChunkStore (+ optional BM25)."""

    def __init__(
        self,
        store: ChunkStore,
        bm25: BM25Index | None = None,
        metric: str = "cosine",
        dense: DenseFlatIndex | None = None,
    ) -> None:
        self.store = store
        self.bm25 = bm25
        # ``dense`` lets the registry CARRY OVER the dense index when it
        # re-wraps an updated BM25 around the same store — without it,
        # every ingest discarded the index's derived state and the
        # segmented index's incremental-append path never engaged
        # (each search retrained + re-encoded the whole corpus)
        if dense is not None and dense.store is store and dense.metric == metric:
            self.dense = dense
        else:
            self.dense = DenseFlatIndex(store, metric=metric)

    def search(
        self,
        query_texts: list[str],
        query_embeddings: jnp.ndarray,
        k: int,
        *,
        candidates: int | None = None,
        hybrid: bool | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (scores [Q, k], corpus rows [Q, k]), fused.

        ``candidates`` is the per-retriever pool size before fusion
        (defaults to max(k, RETRIEVAL_CANDIDATES) — the reference pools
        top-50 chunks before page ranking, page_retriever.py:117-121).
        """
        cfg = get_config()
        if self.store.valid_n == 0:
            q = len(query_texts)
            return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
        kc = min(candidates or max(k, cfg.RETRIEVAL_CANDIDATES), self.store.valid_n)
        k = min(k, kc)
        use_hybrid = (
            cfg.HYBRID_SEARCH_ENABLED if hybrid is None else hybrid
        ) and self.bm25 is not None

        if use_hybrid and self.dense.routes_flat(cfg):
            # one-launch fused program for the common serving case
            # (flat dense + BM25 + fusion); IVF/sharded configurations
            # keep the staged path below (they manage their own
            # multi-device / host-refine programs)
            if query_embeddings.shape[1] not in (
                self.store.dim, self.store.dim_pad,
            ):
                # the fused program pads narrow queries to the corpus
                # lane width — without this guard a dim-mismatched
                # provider (e.g. corpus ingested at 1024, service
                # restarted with a 384-dim embedder) would silently
                # serve garbage instead of the staged path's ValueError
                raise ValueError(
                    f"query dim {query_embeddings.shape[1]} != store dim "
                    f"{self.store.dim}"
                )
            arrays, statics = self.dense.flat_plan(kc)
            statics.pop("k")
            qt, qf, b_arrays, b_statics = self.bm25.topk_plan(query_texts)
            return _fused_hybrid_search(
                query_embeddings, arrays, qt, qf, b_arrays,
                cfg.VECTOR_WEIGHT, cfg.BM25_WEIGHT,
                k=k, kc=kc, fusion_mode=cfg.FUSION_MODE, rrf_k=cfg.RRF_K,
                **statics, **b_statics,
            )

        d_vals, d_rows = self.dense.search(query_embeddings, kc)
        # sanitize: candidates that are padding (-inf dense score) or
        # no-match BM25 rows (score 0) become id -1, which fusion masks.
        d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
        if not use_hybrid:
            return d_vals[:, :k], d_rows[:, :k]

        s_vals, s_rows = self.bm25.topk(query_texts, kc)
        s_rows = jnp.where(s_vals > 0.0, s_rows, -1)
        if cfg.FUSION_MODE == "rrf":
            return rrf_fusion(d_rows, s_rows, k, rrf_k=cfg.RRF_K)
        # weighted: dense already in [0,1] (clamped cosine); BM25 scores are
        # unbounded → min-max over the candidate pool per query.
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        return weighted_fusion(
            d_rows,
            d_vals,
            s_rows,
            s_norm,
            k,
            w_dense=cfg.VECTOR_WEIGHT,
            w_sparse=cfg.BM25_WEIGHT,
        )
