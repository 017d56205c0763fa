"""Flat (exact) dense index over a ChunkStore.

TPU-native replacement for the reference's ``IndexFlatL2`` wrapper
(rag/storage/faiss_index.py:26-128). Chooses between the fused Pallas
kernel (TPU) and the blockwise XLA scan (any backend) at call time.
Scores are in the reference's clamped-cosine space (1 - d/2 for unit
vectors, clamped to [0, 1] — faiss_index.py:87).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import get_config
from ..ops.flat_pallas import choose_group_width, flat_topk_pallas
from ..ops.topk import flat_topk
from .chunk_store import ChunkStore


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def dense_dispatch(
    query_embeddings: jnp.ndarray,
    arrays: tuple,
    *,
    kind: str,
    k: int,
    metric: str,
    valid_n: int,
    group_l: int = 32,
    precise: bool = True,
    block_n: int = 0,
    use_approx: bool = False,
    rescore: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Traceable dense top-k for the FLAT branches (kind/statics from
    :meth:`DenseFlatIndex.flat_plan`). All corpus data arrives in
    ``arrays`` (never closed over — a jit closure over a device corpus
    embeds it in the executable and stalls remote compile), so this is
    safe to call either eagerly or inside an outer jit program (the
    hybrid engine fuses dense+BM25+fusion into one launch — on the TPU
    tunnel every separate dispatch costs ~40 ms of RPC)."""
    if kind == "pallas_int8":
        from ..ops.flat_pallas import flat_topk_pallas_int8

        q8, s8, res = arrays
        vals, rows = flat_topk_pallas_int8(
            query_embeddings, q8, s8, k,
            corpus_res=res, group_l=group_l, valid_n=valid_n, tail="fold",
        )
    elif kind == "pallas":
        (corpus,) = arrays
        vals, rows = flat_topk_pallas(
            query_embeddings, corpus, k,
            group_l=group_l, valid_n=valid_n, precise=precise, tail="fold",
        )
    else:  # "xla"
        (corpus,) = arrays
        vals, rows = flat_topk(
            query_embeddings, corpus, k,
            metric=metric,  # type: ignore[arg-type]
            block_n=block_n, valid_n=valid_n, use_approx=use_approx,
        )
    if rescore and kind in ("pallas", "xla"):
        # exact f32 rescoring of the candidate pool: removes bf16 /
        # approx selection noise from final scores at ~k rows/query.
        # Applies to the Pallas kind too when the store dtype is
        # neither bf16 (in-kernel split-query compensation) nor f32
        # (exact already) — e.g. a float16 store.
        from ..ops.topk import rescore_candidates

        (corpus,) = arrays
        rescored = rescore_candidates(
            query_embeddings, corpus, rows,
            metric=metric,  # type: ignore[arg-type]
        )
        order = jnp.argsort(-rescored, axis=1)
        vals = jnp.take_along_axis(rescored, order, axis=1)
        rows = jnp.take_along_axis(rows, order, axis=1)
    if metric == "cosine":
        # reference score space (faiss_index.py:87); idempotent after
        # rescore (which already clamps) — covers the Pallas and
        # f32-store paths
        vals = jnp.where(jnp.isfinite(vals), jnp.clip(vals, 0.0, 1.0), vals)
    return vals, rows


class DenseFlatIndex:
    """Dense search over the store's embedding matrix.

    Despite the name (kept for the FAISS-IndexFlat lineage), this routes
    to IVF when ``INDEX_KIND=ivf`` and the corpus is large enough to
    partition — the IVF build is lazy and invalidates on store mutation.
    """

    _IVF_MIN_ROWS = 4096

    def __init__(self, store: ChunkStore, metric: str = "cosine") -> None:
        self.store = store
        self.metric = metric
        self._ivf = None
        self._ivf_built_at = -1
        self._sharded = None  # (mesh, sharded corpus) cache
        self._sharded_built_at = -1
        self._q8 = None  # (codes int8, scales f32, residual|None) for DENSE_INT8
        self._q8_built_at = -1
        # store identity for incremental segments: a weakref, NOT id()
        # — CPython recycles addresses, so a dead store's id can match a
        # new store and serve stale rows (review finding)
        self._seg_store_ref = None

    def _use_sharded(self, cfg) -> bool:
        if cfg.SHARDED_SEARCH == "off" or self.metric not in ("cosine", "ip"):
            return False
        n_dev = len(jax.devices())
        if n_dev < 2:
            return False
        if cfg.SHARDED_SEARCH == "on":
            return True
        return self.store.valid_n >= cfg.SHARDED_SEARCH_MIN_ROWS

    def _sharded_corpus(self):
        """(mesh, payload) cache. Payload is ("plain", corpus) or
        ("int8", codes, scales, res|None) — the int8 capacity tier
        composed with sharding (round-3 verdict item 2). Shards are
        row-aligned to the Pallas block so the per-shard search runs the
        same fused kernels as the single-chip path."""
        from ..parallel.mesh import corpus_mesh
        from ..parallel.sharded_search import shard_corpus

        cfg = get_config()
        want_int8 = bool(cfg.DENSE_INT8) and _on_tpu() and cfg.USE_PALLAS
        if (
            self._sharded is None
            or self._sharded_built_at != self.store.mutation_count
            or (self._sharded[1][0] == "int8") != want_int8
        ):
            mesh = corpus_mesh()
            # align shards to the widest kernel block (128·32); padding
            # rows are masked by valid_n before selection
            row_align = 4096 if (_on_tpu() and cfg.USE_PALLAS) else 1
            if want_int8:
                from ..ops.quant import quantize_int8, quantize_int8_residual

                if cfg.DENSE_INT8_RESIDUAL:
                    q8, res, s8 = jax.jit(quantize_int8_residual)(
                        self.store.embeddings
                    )
                    res = shard_corpus(res, mesh, row_align=row_align)
                else:
                    q8, s8 = jax.jit(quantize_int8)(self.store.embeddings)
                    res = None
                payload = (
                    "int8",
                    shard_corpus(q8, mesh, row_align=row_align),
                    shard_corpus(s8, mesh, row_align=row_align),
                    res,
                )
            else:
                payload = (
                    "plain",
                    shard_corpus(
                        self.store.embeddings, mesh, row_align=row_align
                    ),
                )
            self._sharded = (mesh, payload)
            self._sharded_built_at = self.store.mutation_count
        return self._sharded

    def _segmented_index(self):
        """Streaming capacity index (INDEX_KIND=segmented): appends only
        the NEW rows on each store mutation instead of rebuilding —
        deletes swap the store object (copy-on-write), which triggers a
        full rebuild here (gids are append-order row ids)."""
        from .segmented_residual import SegmentedResidualIndex

        cfg = get_config()
        store = self.store
        fresh = (
            self._ivf is None
            or not isinstance(self._ivf, SegmentedResidualIndex)
            or self._seg_store_ref is None
            or self._seg_store_ref() is not store
            or self._ivf.total_rows > store.valid_n
        )
        if fresh:
            seg_rows = max(4096, cfg.IVF_NLIST * 4)
            sample = store.embeddings[: min(store.valid_n, 8 * seg_rows)]
            self._ivf = SegmentedResidualIndex.train(
                sample, nlist=cfg.IVF_NLIST,
                seg_rows=seg_rows,
                bits=cfg.IVF_RESIDUAL_BITS,
                refine=cfg.IVF_REFINE_K > 0,
            )
            import weakref

            self._seg_store_ref = weakref.ref(store)
        idx = self._ivf
        done = idx.total_rows
        while done < store.valid_n:
            stop = min(done + idx.seg_rows, store.valid_n)
            idx.append(store.embeddings[done:stop])
            done = stop
        self._ivf_built_at = store.mutation_count
        return idx

    def _bits_index(self):
        """Capacity tier (INDEX_KIND=bits): list-major binary-residual
        store with streaming appends; rebuilt (fresh train + capacity
        2× current) only when the store object changes or the fixed
        capacity is outgrown."""
        from .bits_index import IVFBitsIndex

        cfg = get_config()
        store = self.store
        need = store.valid_n
        fresh = (
            self._ivf is None
            or not isinstance(self._ivf, IVFBitsIndex)
            or self._seg_store_ref is None
            or self._seg_store_ref() is not store
            or self._ivf.total_rows > need
            or need > self._ivf.n_cap - self._ivf.nlist  # spill headroom
        )
        if fresh:
            sample = store.embeddings[: min(need, 8 * cfg.IVF_NLIST)]
            self._ivf = IVFBitsIndex.train(
                sample, cfg.IVF_NLIST,
                # 4× headroom so streaming growth amortizes rebuilds
                # (a rebuild = fresh k-means + full re-encode)
                capacity=max(4 * need, 64 * cfg.IVF_NLIST),
                refine=cfg.IVF_REFINE_K > 0,
            )
            import weakref

            self._seg_store_ref = weakref.ref(store)
        idx = self._ivf
        done = idx.total_rows
        chunk = 500_000
        while done < need:
            stop = min(done + chunk, need)
            idx.append(store.embeddings[done:stop])
            done = stop
        self._ivf_built_at = store.mutation_count
        return idx

    def _int8_mirror(self, residual: bool = False):
        """int8+scales mirror of the store for the int8 Pallas kernel
        (DENSE_INT8): quantized on device, cached per store mutation.
        With ``residual`` (DENSE_INT8_RESIDUAL) the mirror also carries
        the q2 residual plane for ~15-bit in-kernel corpus precision —
        returns (q8, s8, res) vs (q8, s8, None)."""
        if (
            self._q8 is None
            or self._q8_built_at != self.store.mutation_count
            or (residual and self._q8[2] is None)
        ):
            from ..ops.quant import quantize_int8, quantize_int8_residual

            if residual:
                q8, res, s8 = jax.jit(quantize_int8_residual)(
                    self.store.embeddings
                )
            else:
                q8, s8 = jax.jit(quantize_int8)(self.store.embeddings)
                res = None
            self._q8 = (q8, s8, res)
            self._q8_built_at = self.store.mutation_count
        return self._q8

    def _ivf_index(self):
        if self._ivf is None or self._ivf_built_at != self.store.mutation_count:
            cfg = get_config()
            if cfg.INDEX_KIND == "bits":
                return self._bits_index()
            if cfg.INDEX_KIND == "segmented":
                return self._segmented_index()
            if cfg.INDEX_KIND == "ivf_residual":
                # capacity index: int4 residual codes, ~8× smaller than
                # f32 / 2× smaller than int8 (index/ivf_residual.py)
                from .ivf_residual import IVFResidualIndex

                self._ivf = IVFResidualIndex.build(
                    self.store.embeddings[: self.store.valid_n],
                    nlist=cfg.IVF_NLIST,
                    refine=cfg.IVF_REFINE_K > 0,
                    bits=cfg.IVF_RESIDUAL_BITS,
                )
            else:
                from .ivf_index import IVFFlatIndex

                self._ivf = IVFFlatIndex.build(
                    self.store.embeddings[: self.store.valid_n],
                    nlist=cfg.IVF_NLIST,
                )
            self._ivf_built_at = self.store.mutation_count
        return self._ivf

    def search(
        self, query_embeddings: jnp.ndarray, k: int, *, exact: bool | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k over valid rows. Returns (scores [Q,k], rows [Q,k]).

        ``exact=None`` auto-selects: fused Pallas partial-top-k on TPU
        (recall-targeted group width), exact blockwise scan elsewhere.
        """
        cfg = get_config()
        store = self.store
        if store.valid_n == 0:
            q = query_embeddings.shape[0]
            return (
                jnp.zeros((q, 0), jnp.float32),
                jnp.zeros((q, 0), jnp.int32),
            )
        k = min(k, store.valid_n)
        if query_embeddings.shape[1] != store.dim_pad:
            if query_embeddings.shape[1] != store.dim:
                raise ValueError(
                    f"query dim {query_embeddings.shape[1]} != store dim {store.dim}"
                )
            query_embeddings = jnp.pad(
                query_embeddings, ((0, 0), (0, store.dim_pad - store.dim))
            )
        if self._use_sharded(cfg) and exact is not True:
            from ..parallel.sharded_search import (
                pallas_group_l,
                sharded_flat_topk,
                sharded_flat_topk_int8,
            )

            mesh, payload = self._sharded_corpus()
            if payload[0] == "int8":
                _, codes, scales, res = payload
                vals, rows = sharded_flat_topk_int8(
                    query_embeddings, codes, scales, k, mesh,
                    res=res, valid_n=store.valid_n,
                )
            else:
                sharded = payload[1]
                shard_rows = max(sharded.shape[0] // mesh.shape["data"], 1)
                use_pallas = (
                    cfg.USE_PALLAS
                    and _on_tpu()
                    and pallas_group_l(shard_rows, k) is not None
                )
                vals, rows = sharded_flat_topk(
                    query_embeddings, sharded, k, mesh,
                    valid_n=store.valid_n,
                    block_n=min(cfg.SEARCH_BLOCK_N, shard_rows),
                    kernel="pallas" if use_pallas else "xla",
                )
            if self.metric == "cosine":
                vals = jnp.where(jnp.isfinite(vals), jnp.clip(vals, 0.0, 1.0), vals)
            return vals, rows
        if self._routes_ivf(cfg, exact):
            ivf = self._ivf_index()
            kwargs = (
                {"refine_k": cfg.IVF_REFINE_K}
                if cfg.IVF_REFINE_K > 0 and getattr(ivf, "host_int8", None) is not None
                else {}
            )
            vals, rows = ivf.search(
                query_embeddings, k, nprobe=cfg.IVF_NPROBE, **kwargs
            )
            if self.metric == "cosine":
                vals = jnp.where(jnp.isfinite(vals), jnp.clip(vals, 0.0, 1.0), vals)
            return vals, rows
        arrays, statics = self.flat_plan(k, exact=exact)
        return dense_dispatch(query_embeddings, arrays, **statics)

    def _routes_ivf(self, cfg, exact: bool | None) -> bool:
        return (
            cfg.INDEX_KIND in ("ivf", "ivf_residual", "segmented", "bits")
            and exact is not True
            and self.store.valid_n >= self._IVF_MIN_ROWS
            and self.metric in ("cosine", "ip")
        )

    def routes_flat(self, cfg=None, *, exact: bool | None = None) -> bool:
        """True when :meth:`search` takes a FLAT branch (i.e.
        :meth:`flat_plan` describes the computation). Shares the exact
        routing predicates with :meth:`search` — the hybrid engine uses
        this to decide whether the fused one-launch program applies."""
        cfg = cfg or get_config()
        if self._use_sharded(cfg) and exact is not True:
            return False
        return not self._routes_ivf(cfg, exact)

    def flat_plan(
        self, k: int, *, exact: bool | None = None
    ) -> tuple[tuple, dict]:
        """(arrays, statics) for :func:`dense_dispatch` covering the
        FLAT branches (Pallas bf16/int8, XLA blockwise ± rescore).
        Shared by :meth:`search` and the hybrid engine's fused
        one-launch program — single source for branch selection, and
        the corpus always travels as ARGUMENTS (jit-closure-safe).
        Callers must have routed sharded/IVF configurations elsewhere.
        """
        cfg = get_config()
        store = self.store
        k = min(k, store.valid_n)
        use_pallas = cfg.USE_PALLAS and _on_tpu() and self.metric in ("cosine", "ip")
        if exact is True:
            use_pallas = False
        if use_pallas:
            # ≤32 (block_n 4096) measured fastest at 1M×d1024 on v5e:
            # wider groups shrink the [Q, N/L] candidate tail the top-k
            # pass must reduce, and the 8 MB double-buffered corpus block
            # still fits scoped VMEM (12.1 vs 14.5 ms/batch for 16/2048)
            group_l = min(32, choose_group_width(store.valid_n, k))
            # shrink until the kernel's 128·group_l block divides n_pad
            while group_l > 8 and store.n_pad % (128 * group_l) != 0:
                group_l //= 2
            if cfg.DENSE_INT8:
                # split-query compensation: in-kernel scores match the
                # f32-query × bf16-corpus product, so no candidate
                # rescore pass is needed afterwards (round 3)
                q8, s8, res = self._int8_mirror(
                    residual=cfg.DENSE_INT8_RESIDUAL
                )
                return (q8, s8, res), dict(
                    kind="pallas_int8", k=k, metric=self.metric,
                    valid_n=store.valid_n, group_l=group_l,
                )
            return (store.embeddings,), dict(
                kind="pallas", k=k, metric=self.metric,
                valid_n=store.valid_n, group_l=group_l,
                precise=store.embeddings.dtype == jnp.bfloat16,
                # f16 (or other non-bf16/non-f32) stores lose the
                # in-kernel compensation — rescore exactly, matching the
                # pre-refactor '(dtype != f32) and not precise' condition
                rescore=store.embeddings.dtype
                not in (jnp.bfloat16, jnp.float32),
            )
        use_approx = (
            _on_tpu() and self.metric in ("cosine", "ip") and exact is not True
        )
        return (store.embeddings,), dict(
            kind="xla", k=k, metric=self.metric, valid_n=store.valid_n,
            block_n=min(cfg.SEARCH_BLOCK_N, store.n_pad),
            use_approx=use_approx,
            rescore=bool(
                use_approx or store.embeddings.dtype != jnp.float32
            ),
        )
