"""Sharded hybrid engine: dense + BM25 + fusion over a device mesh.

BASELINE config #5 (10M-chunk sharded corpus, streaming ingest + hybrid
query) end-to-end — the capability the reference only declares
(rag/config.py:43-45) and round 2 only demonstrated dense. Streaming
appends land dense rows via :class:`ShardedCorpus` (O(batch) in-shard
scatter) and postings via :class:`ShardedBM25` at the SAME (shard, slot)
placement, so both sides agree on every interleaved global row id
(``slot · n_shards + shard``).

Query = one fused program per retriever family:

- dense: per-shard exact flat top-k + all-gather merge
  (:func:`sharded_flat_topk`),
- sparse: per-shard exact BM25 top-k + all-gather merge
  (:class:`ShardedBM25`),
- fusion: the SAME single-device fusion kernels
  (:mod:`intool_rag_tpu.ops.fusion`) over the merged global candidate
  lists — mergers are exact, so the fused ranking equals the
  single-device HybridEngine on the union corpus (up to float summation
  order and p_max pruning, which per-shard capping only loosens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import get_config
from ..index.bm25_index import BM25Params
from ..ops.fusion import normalize_minmax, rrf_fusion, weighted_fusion
from .sharded_bm25 import ShardedBM25
from .sharded_corpus import ShardedCorpus


class ShardedHybrid:
    """Row-sharded hybrid (dense + BM25) corpus with streaming append."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        *,
        capacity_per_shard: int = 1024,
        dtype=jnp.float32,
        params: BM25Params | None = None,
        quant: str = "none",
        interpret: bool | None = None,
    ) -> None:
        self.mesh = mesh
        self.corpus = ShardedCorpus(
            dim, mesh, capacity_per_shard=capacity_per_shard, dtype=dtype,
            quant=quant, interpret=interpret,
        )
        self.bm25 = ShardedBM25(mesh, params=params)

    @property
    def valid_n(self) -> int:
        return self.corpus.valid_n

    def append(self, texts: list[str], embeddings: np.ndarray) -> np.ndarray:
        """Append aligned ``texts[i]`` / ``embeddings[i]``; returns the
        global row ids. Dense placement decides; postings follow."""
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

    # ---------------- checkpoint / restore (SURVEY §5.4) ----------------

    def save(self, path) -> None:
        """Persist the full engine: dense shards via the per-shard
        sharded-array writer plus the sparse counted state (tokenized
        postings + global stats). Row ids are interleaved by shard
        count, so a checkpoint binds to its mesh size — load() enforces
        it."""
        import json
        from pathlib import Path

        from ..storage.sharded import save_sharded

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        meta = {
            "counts": self.corpus.counts.tolist(),
            "cap": self.corpus.cap,
            "dim": self.corpus.dim,
            "n_shards": self.corpus.n_shards,
            "quant": self.corpus.quant,
        }
        if self.corpus.quant == "none":
            save_sharded(self.corpus.data, path / "dense", meta=meta)
        else:
            save_sharded(self.corpus.codes, path / "dense", meta=meta)
            save_sharded(self.corpus.scales, path / "dense_scales")
            if self.corpus.res is not None:
                save_sharded(self.corpus.res, path / "dense_res")
        bm = self.bm25
        arrays = {"df": bm.df}
        for i, sc in enumerate(bm.shards):
            arrays[f"s{i}_slots"] = sc.slots
            arrays[f"s{i}_indptr"] = sc.indptr
            arrays[f"s{i}_terms"] = sc.terms
            arrays[f"s{i}_counts"] = sc.counts
            arrays[f"s{i}_lens"] = sc.lens
        np.savez_compressed(path / "sparse.npz", **arrays)
        (path / "sparse.meta.json").write_text(
            json.dumps({
                "vocab": list(bm.vocab.keys()),
                "n_docs": bm.n_docs,
                "total_len": bm.total_len,
                "cap": bm._cap,
                "k1": bm.params.k1,
                "b": bm.params.b,
                "p_max": bm.params.p_max,
                "n_shards": bm.n_shards,
            }, ensure_ascii=False),
            encoding="utf-8",
        )

    @classmethod
    def load(cls, path, mesh: Mesh) -> "ShardedHybrid":
        import json
        from pathlib import Path

        from ..index.bm25_index import BM25Params
        from ..parallel.sharded_bm25 import _ShardCounts
        from ..storage.sharded import load_sharded

        path = Path(path)
        meta = json.loads((path / "sparse.meta.json").read_text(encoding="utf-8"))
        n_shards = mesh.shape["data"]
        if n_shards != meta["n_shards"]:
            raise ValueError(
                f"checkpoint was sharded {meta['n_shards']}-way; mesh has "
                f"{n_shards} data shards (interleaved row ids bind to the "
                "shard count)"
            )
        data, dmeta = load_sharded(path / "dense", mesh)
        quant = dmeta.get("quant", "none")
        engine = cls(
            dmeta["dim"], mesh, capacity_per_shard=dmeta["cap"],
            params=BM25Params(
                k1=meta["k1"], b=meta["b"], p_max=meta["p_max"]
            ),
            quant=quant,
        )
        engine.corpus.cap = dmeta["cap"]
        engine.corpus.counts = np.asarray(dmeta["counts"], np.int32)
        if quant == "none":
            engine.corpus.data = data
        else:
            engine.corpus.codes = data
            engine.corpus.scales, _ = load_sharded(path / "dense_scales", mesh)
            if quant == "int8r":
                engine.corpus.res, _ = load_sharded(path / "dense_res", mesh)
        engine.corpus._place = engine.corpus._build_place()

        arrays = np.load(path / "sparse.npz")
        bm = engine.bm25
        bm.vocab = {t: i for i, t in enumerate(meta["vocab"])}
        bm.df = arrays["df"]
        bm.n_docs = meta["n_docs"]
        bm.total_len = meta["total_len"]
        bm._cap = meta["cap"]
        bm.shards = [
            _ShardCounts(
                slots=arrays[f"s{i}_slots"],
                indptr=arrays[f"s{i}_indptr"],
                terms=arrays[f"s{i}_terms"],
                counts=arrays[f"s{i}_counts"],
                lens=arrays[f"s{i}_lens"],
            )
            for i in range(n_shards)
        ]
        return engine

    def search(
        self,
        query_texts: list[str],
        query_embeddings: jax.Array,
        k: int,
        *,
        candidates: int | None = None,
        hybrid: bool | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Fused ``(scores [Q, k], global row ids [Q, k])`` — the sharded
        analogue of ``HybridEngine.search`` (same config surface, same
        fusion modes)."""
        cfg = get_config()
        if self.valid_n == 0:
            q = len(query_texts)
            return jnp.zeros((q, 0), jnp.float32), jnp.zeros((q, 0), jnp.int32)
        kc = min(
            candidates or max(k, cfg.RETRIEVAL_CANDIDATES), self.valid_n
        )
        k = min(k, kc)
        use_hybrid = (
            cfg.HYBRID_SEARCH_ENABLED if hybrid is None else hybrid
        )

        d_vals, d_rows = self.corpus.search(query_embeddings, kc)
        d_rows = jnp.where(jnp.isfinite(d_vals), d_rows, -1)
        if not use_hybrid:
            return d_vals[:, :k], d_rows[:, :k]

        s_vals, s_rows = self.bm25.topk(query_texts, kc)
        if cfg.FUSION_MODE == "rrf":
            return rrf_fusion(d_rows, s_rows, k, rrf_k=cfg.RRF_K)
        s_norm = normalize_minmax(s_vals)
        d_vals = jnp.where(d_rows >= 0, d_vals, 0.0)
        s_norm = jnp.where(s_rows >= 0, s_norm, 0.0)
        return weighted_fusion(
            d_rows, d_vals, s_rows, s_norm, k,
            w_dense=cfg.VECTOR_WEIGHT, w_sparse=cfg.BM25_WEIGHT,
        )
