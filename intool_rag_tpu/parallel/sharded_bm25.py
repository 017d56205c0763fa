"""Document-sharded BM25: postings partitioned over the mesh by doc row.

The sparse half of sharded hybrid search (BASELINE config #5; SURVEY.md
§5.8(a)(c) — the reference has no distributed anything, so this is a
new first-class component). Each mesh shard owns the postings of the
documents whose dense rows live on that shard (same interleaved row-id
scheme as :mod:`intool_rag_tpu.parallel.sharded_corpus`: global row id
``slot · n_shards + shard``). A query runs the exact single-shard BM25
row-layout kernel (:func:`intool_rag_tpu.ops.bm25.bm25_topk_rows` over
the same two-tier hot/cold postings repack the single-device index
uses — the 1-D dynamic-slice gather measured 3.6× slower) per shard
inside ``shard_map``, maps local slots to global row ids, and merges
candidates with one ``all_gather`` + global top-k — the same
local-top-k/merge shape as dense sharded search, so the collectives ride
ICI and postings never move.

Statistics (idf, avgdl) are corpus-GLOBAL — computed on the host over
all shards — so per-document scores are identical to a single-device
index over the union corpus (exactly, when ``p_max`` does not prune;
with pruning, per-shard capping keeps ≥ as many postings per term as
global capping, so sharded recall is never worse).

Vocabulary is append-only (term → id in first-seen order): merging new
documents never remaps existing term ids, which keeps streaming appends
O(new postings) on the host plus a vectorized per-shard postings
rebuild (weights depend on avgdl, which moves with every append — exact
BM25 requires the re-weight; it is vectorized NumPy, not a re-tokenize).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax ≥ 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.bm25_index import BM25Params
from ..ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed, build_padded_layout


@dataclasses.dataclass
class _ShardCounts:
    """Host-side counted representation of one shard's documents."""

    slots: np.ndarray  # [n_docs] i32 — slot id of each doc within the shard
    indptr: np.ndarray  # [n_docs + 1] i64 — into terms/counts
    terms: np.ndarray  # [nnz] i32 — global term ids
    counts: np.ndarray  # [nnz] i32 — term frequency in the doc
    lens: np.ndarray  # [n_docs] i32 — token count of the doc

    @classmethod
    def empty(cls) -> "_ShardCounts":
        return cls(
            slots=np.zeros(0, np.int32),
            indptr=np.zeros(1, np.int64),
            terms=np.zeros(0, np.int32),
            counts=np.zeros(0, np.int32),
            lens=np.zeros(0, np.int32),
        )

    def extend(self, other: "_ShardCounts") -> "_ShardCounts":
        return _ShardCounts(
            slots=np.concatenate([self.slots, other.slots]),
            indptr=np.concatenate(
                [self.indptr, other.indptr[1:] + self.indptr[-1]]
            ),
            terms=np.concatenate([self.terms, other.terms]),
            counts=np.concatenate([self.counts, other.counts]),
            lens=np.concatenate([self.lens, other.lens]),
        )


class ShardedBM25:
    """BM25 postings sharded by document row over the mesh's ``data`` axis."""

    def __init__(self, mesh: Mesh, params: BM25Params | None = None) -> None:
        self.mesh = mesh
        self.n_shards = mesh.shape["data"]
        self.params = params or BM25Params.from_config()
        self.vocab: dict[str, int] = {}
        self.df = np.zeros(0, np.int64)
        self.total_len = 0
        self.n_docs = 0
        self.shards = [_ShardCounts.empty() for _ in range(self.n_shards)]
        self._device = None  # (term_start, term_len, post_docs, post_w, idf)
        self._cap = 0  # slot-space size used as the local no-doc sentinel

    # ---------------- build / append ----------------

    def _tokenize_batch(self, texts: list[str]) -> _ShardCounts:
        """Count terms of new docs against the append-only global vocab."""
        from ..index.analyzer import tokenize

        indptr = [0]
        terms: list[int] = []
        counts: list[int] = []
        lens = []
        vocab = self.vocab
        for text in texts:
            doc: dict[int, int] = {}
            toks = tokenize(text)
            lens.append(len(toks))
            for t in toks:
                tid = vocab.get(t)
                if tid is None:
                    tid = len(vocab)
                    vocab[t] = tid
                doc[tid] = doc.get(tid, 0) + 1
            terms.extend(doc.keys())
            counts.extend(doc.values())
            indptr.append(len(terms))
        return _ShardCounts(
            slots=np.zeros(len(texts), np.int32),  # filled by caller
            indptr=np.asarray(indptr, np.int64),
            terms=np.asarray(terms, np.int32),
            counts=np.asarray(counts, np.int32),
            lens=np.asarray(lens, np.int32),
        )

    def append(
        self,
        texts: list[str],
        dest_shard: np.ndarray,
        dest_slot: np.ndarray,
        *,
        cap: int,
    ) -> None:
        """Add ``texts[i]`` as the document at ``(dest_shard[i],
        dest_slot[i])`` — the placement chosen by the dense
        :class:`~intool_rag_tpu.parallel.sharded_corpus.ShardedCorpus`
        append, so sparse and dense agree on every global row id.
        ``cap`` is the corpus's current per-shard slot capacity (the
        local no-doc sentinel for the kernel)."""
        if not texts:
            self._cap = cap
            return
        new = self._tokenize_batch(texts)
        # grow global df with each new doc's unique terms
        v = len(self.vocab)
        if v > len(self.df):
            self.df = np.concatenate(
                [self.df, np.zeros(v - len(self.df), np.int64)]
            )
        np.add.at(self.df, new.terms, 1)
        self.total_len += int(new.lens.sum())
        self.n_docs += len(texts)
        # split the batch per destination shard, preserving slot ids
        dest_shard = np.asarray(dest_shard, np.int32)
        dest_slot = np.asarray(dest_slot, np.int32)
        sizes = np.diff(new.indptr)
        for s in range(self.n_shards):
            mask = dest_shard == s
            if not mask.any():
                continue
            docs = np.flatnonzero(mask)
            take_pairs = np.concatenate(
                [np.arange(new.indptr[d], new.indptr[d + 1]) for d in docs]
            ) if len(docs) else np.zeros(0, np.int64)
            part = _ShardCounts(
                slots=dest_slot[docs],
                indptr=np.concatenate(
                    [[0], np.cumsum(sizes[docs])]
                ).astype(np.int64),
                terms=new.terms[take_pairs],
                counts=new.counts[take_pairs],
                lens=new.lens[docs],
            )
            self.shards[s] = self.shards[s].extend(part)
        self._cap = cap
        self._device = None  # lazily rebuilt on next query

    # ---------------- device postings ----------------

    @property
    def avgdl(self) -> float:
        return max(self.total_len / max(self.n_docs, 1), 1e-6)

    def _build_device(self):
        """Stack per-shard postings into mesh-sharded arrays."""
        v = len(self.vocab)
        k1, b = self.params.k1, self.params.b
        p_max = self.params.p_max
        avgdl = self.avgdl
        per_shard = []
        wmax = np.zeros(v, np.float32)  # corpus-global per-term max weight
        for sc in self.shards:
            nnz = len(sc.terms)
            doc_of_pair = np.repeat(
                np.arange(len(sc.lens), dtype=np.int64), np.diff(sc.indptr)
            )
            tf = sc.counts.astype(np.float32)
            norm = (
                k1 * (1.0 - b + b * sc.lens[doc_of_pair] / avgdl)
            ).astype(np.float32)
            w = tf * (k1 + 1.0) / (tf + norm)
            order = np.lexsort((-w, sc.terms)) if nnz else np.zeros(0, np.int64)
            sorted_terms = sc.terms[order]
            sorted_slots = sc.slots[doc_of_pair[order]].astype(np.int32)
            sorted_w = w[order]
            counts_per_term = np.bincount(sorted_terms, minlength=v)
            capped = np.minimum(counts_per_term, p_max)
            term_len = capped.astype(np.int32)
            term_start = np.zeros(v, np.int32)
            term_start[1:] = np.cumsum(capped[:-1]).astype(np.int32)
            starts_full = np.zeros(v, np.int64)
            starts_full[1:] = np.cumsum(counts_per_term[:-1])
            rank = np.arange(nnz, dtype=np.int64) - starts_full[sorted_terms]
            keep = rank < p_max
            # two-tier row layout (round-3: the 1-D dynamic-slice gather
            # ran at ~1.2 GB/s; aligned row gathers are 3.6× faster —
            # same repack the single-device index uses). Hot width stays
            # the full p_max so per-shard pruning still keeps ≥ as many
            # postings per term as global capping (exactness guarantee).
            per_shard.append(build_padded_layout(
                term_start, term_len, sorted_slots[keep], sorted_w[keep],
                n_docs=self._cap, p_max=p_max,
            ))
            # per-shard max weight per term sits at each term's first
            # posting (impact order); fold into the corpus-global max that
            # drives the packed kernel's shard-independent quantization
            nz = counts_per_term > 0
            shard_wmax = np.zeros(v, np.float32)
            if nnz:
                shard_wmax[nz] = sorted_w[starts_full[nz]]
            np.maximum(wmax, shard_wmax, out=wmax)
        s = self.n_shards
        h_max = max(p["hot_docs"].shape[0] for p in per_shard)
        c_max = max(p["cold_docs"].shape[0] for p in per_shard)
        cold_width = per_shard[0]["cold_docs"].shape[1]
        term_row = np.stack([p["term_row"] for p in per_shard])
        term_hot = np.stack([p["term_hot"] for p in per_shard])
        hot_docs = np.full((s, h_max, p_max), self._cap, np.int32)
        hot_w = np.zeros((s, h_max, p_max), np.float32)
        cold_docs = np.full((s, c_max, cold_width), self._cap, np.int32)
        cold_w = np.zeros((s, c_max, cold_width), np.float32)
        for i, p in enumerate(per_shard):
            hot_docs[i, : p["hot_docs"].shape[0]] = p["hot_docs"]
            hot_w[i, : p["hot_w"].shape[0]] = p["hot_w"]
            cold_docs[i, : p["cold_docs"].shape[0]] = p["cold_docs"]
            cold_w[i, : p["cold_w"].shape[0]] = p["cold_w"]
        df = np.maximum(self.df.astype(np.float64), 0)
        idf = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)).astype(
            np.float32
        )
        row = NamedSharding(self.mesh, P("data", None))
        row3 = NamedSharding(self.mesh, P("data", None, None))
        rep = NamedSharding(self.mesh, P(None))
        self._device = (
            jax.device_put(jnp.asarray(term_row), row),
            jax.device_put(jnp.asarray(term_hot), row),
            jax.device_put(jnp.asarray(hot_docs), row3),
            jax.device_put(jnp.asarray(hot_w), row3),
            jax.device_put(jnp.asarray(cold_docs), row3),
            jax.device_put(jnp.asarray(cold_w), row3),
            jax.device_put(jnp.asarray(idf), rep),
            jax.device_put(jnp.asarray(wmax), rep),
        )
        return self._device

    def device_arrays(self):
        return self._device if self._device is not None else self._build_device()

    # ---------------- query ----------------

    def encode_queries(self, queries: list[str], max_terms: int | None = None):
        """Same padded encoding contract as BM25Index.encode_queries."""
        from ..config import get_config
        from ..index.analyzer import tokenize

        t_max = max_terms or get_config().BM25_MAX_QUERY_TERMS
        q = len(queries)
        qterms = np.full((q, t_max), -1, np.int32)
        qtf = np.zeros((q, t_max), np.float32)
        for i, text in enumerate(queries):
            counts: dict[int, int] = {}
            for term in tokenize(text):
                tid = self.vocab.get(term)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0) + 1
            for j, (tid, tf) in enumerate(sorted(counts.items())[:t_max]):
                qterms[i, j] = tid
                qtf[i, j] = tf
        return jnp.asarray(qterms), jnp.asarray(qtf)

    def topk(self, queries: list[str], k: int):
        """Global sparse top-k: ``(scores [Q,k], global row ids [Q,k])``.

        No-match slots come back as ``(0.0, -1)`` — the same contract the
        HybridEngine applies to the single-device kernel's output."""
        qterms, qtf = self.encode_queries(queries)
        tr, th, hd, hw, cd, cw, idf, wmax = self.device_arrays()
        return _sharded_bm25_topk(
            qterms, qtf, tr, th, hd, hw, cd, cw, idf, wmax, self.mesh,
            k=k, cap=self._cap, n_shards=self.n_shards,
        )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "cap", "n_shards"),
)
def _sharded_bm25_topk(
    qterms, qtf, term_row, term_hot, hot_docs, hot_w, cold_docs, cold_w,
    idf, term_wmax, mesh, *, k: int, cap: int, n_shards: int,
):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None), P(None, None),
            P("data", None), P("data", None),
            P("data", None, None), P("data", None, None),
            P("data", None, None), P("data", None, None),
            P(None), P(None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def search(qt, qf, tr, th, hd, hw, cd, cw, idf_r, wmax_r):
        shard = jax.lax.axis_index("data")
        # packed single-key aggregation when the per-shard capacity fits
        # the i32 key (always true for realistic shard sizes). The
        # corpus-GLOBAL term_wmax pins the quantization grid, so every
        # shard quantizes identical contributions to identical levels —
        # sharded scores are bit-equal to the single-device packed kernel
        # over the same corpus (test_sharded_hybrid parity).
        if cap < 1 << 20:
            vals, slots = bm25_topk_rows_packed(
                qt, qf, tr[0], th[0], hd[0], hw[0], cd[0], cw[0], idf_r,
                k, n_docs=cap, term_wmax=wmax_r,
            )
        else:
            vals, slots = bm25_topk_rows(
                qt, qf, tr[0], th[0], hd[0], hw[0], cd[0], cw[0], idf_r,
                k, n_docs=cap,
            )
        # zero-score slots are no-matches (kernel normalizes them to
        # (0.0, id 0)) — mask to -inf/-1 so the merge prefers real hits
        invalid = vals <= 0.0
        gids = jnp.where(invalid, -1, slots * n_shards + shard)
        vals = jnp.where(invalid, -jnp.inf, vals)
        all_vals = jax.lax.all_gather(vals, "data", axis=1, tiled=True)
        all_gids = jax.lax.all_gather(gids, "data", axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, min(k, all_vals.shape[1]))
        top_gids = jnp.take_along_axis(all_gids, pos, axis=1)
        finite = jnp.isfinite(top_vals)
        return (
            jnp.where(finite, top_vals, 0.0),
            jnp.where(finite, top_gids, -1),
        )

    return search(
        qterms, qtf, term_row, term_hot, hot_docs, hot_w, cold_docs,
        cold_w, idf, term_wmax,
    )
