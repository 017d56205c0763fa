"""BM25 sparse index: vocabulary, postings build, device residency.

Build is host-side (string processing); the scoring arrays live on device
and are consumed by :mod:`intool_rag_tpu.ops.bm25`. The BM25 variant is
the Lucene/standard one:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))            (always ≥ 0)
    w(t, d)  = tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))
    score    = Σ_t q_tf(t) · idf(t) · w(t, d)

Postings are impact-ordered (descending weight) per term so capping at
``p_max`` keeps each term's strongest postings (impact pruning).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import get_config
from .analyzer import tokenize


def bm25_dispatch(
    qt: jnp.ndarray,
    qf: jnp.ndarray,
    arrays: tuple,
    *,
    k: int,
    packed: bool,
    n_docs: int,
    hot_cap: int | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Traceable BM25 top-k (plan from :meth:`BM25Index.topk_plan`).
    Safe to call eagerly or inside an outer jit — the postings layout
    travels in ``arrays`` (never closed over), so the hybrid engine can
    fuse this with dense search and fusion into one device launch."""
    from ..ops.bm25 import bm25_topk_rows, bm25_topk_rows_packed

    term_row, term_hot, hot_docs, hot_w, cold_docs, cold_w, idf, wmax = arrays
    args = (
        qt, qf, term_row, term_hot, hot_docs, hot_w, cold_docs, cold_w,
        idf, k,
    )
    if packed:
        return bm25_topk_rows_packed(
            *args, n_docs=n_docs, term_wmax=wmax, hot_cap=hot_cap
        )
    return bm25_topk_rows(*args, n_docs=n_docs)


@dataclasses.dataclass
class BM25Params:
    k1: float = 1.5
    b: float = 0.75
    p_max: int = 4096  # max postings per term kept on device

    @classmethod
    def from_config(cls) -> "BM25Params":
        cfg = get_config()
        return cls(k1=cfg.BM25_K1, b=cfg.BM25_B)


class BM25Index:
    """Sparse keyword index over a chunk corpus."""

    _counted = None  # counted-term representation (enables append())

    def __init__(
        self,
        vocab: dict[str, int],
        term_start: np.ndarray,
        term_len: np.ndarray,
        post_docs: np.ndarray,
        post_w: np.ndarray,
        idf: np.ndarray,
        n_docs: int,
        params: BM25Params,
        avgdl: float,
    ) -> None:
        self.vocab = vocab
        self.n_docs = n_docs
        self.params = params
        self.avgdl = avgdl
        # device arrays
        self.term_start = jnp.asarray(term_start)
        self.term_len = jnp.asarray(term_len)
        self.post_docs = jnp.asarray(post_docs)
        self.post_w = jnp.asarray(post_w)
        self.idf = jnp.asarray(idf)
        # two-tier row layout for the fast gather path (built lazily:
        # ops/bm25.build_padded_layout — round-3: the dynamic-slice
        # gather was the dominant BM25 stage cost on TPU)
        self._rows = None

    def _row_layout(self, cold_width: int = 64):
        if self._rows is None:
            from ..ops.bm25 import build_row_layout

            self._rows = build_row_layout(
                self.term_start, self.term_len, self.post_docs,
                self.post_w, n_docs=self.n_docs,
                p_max=self.params.p_max, cold_width=cold_width,
            )
        return self._rows

    # ---------------- build ----------------

    @classmethod
    def build(
        cls, texts: list[str], params: BM25Params | None = None
    ) -> "BM25Index":
        """Builds the index. Tokenization/counting uses the native C++
        analyzer when available (intool_rag_tpu/native — identical token
        stream to the Python analyzer, parity-tested), then vectorized
        NumPy for weights and impact-ordering."""
        params = params or BM25Params.from_config()
        counted = cls._count_terms(texts)
        index = cls._from_counts(counted, len(texts), params)
        index._counted = counted  # retained for incremental append
        return index

    def append(self, texts: list[str]) -> "BM25Index":
        """Incremental extension: tokenize only the NEW texts, merge the
        counted representations, and rebuild postings vectorized. Avoids
        re-tokenizing the whole corpus on every ingest (the expensive
        host-side step); idf/avgdl recompute exactly over the union.
        Returns a new index (the old one stays valid)."""
        if not texts:
            return self
        if getattr(self, "_counted", None) is None:
            raise ValueError("index was loaded without counts; rebuild instead")
        old_vocab, old_df, old_indptr, old_terms, old_counts, old_len = self._counted
        new_vocab_l, new_df, new_indptr, new_terms, new_counts, new_len = (
            self._count_terms(texts)
        )
        # merge vocabularies (both sorted); remap both term-id spaces
        merged = sorted(set(old_vocab) | set(new_vocab_l))
        merged_pos = {t: i for i, t in enumerate(merged)}
        old_map = np.asarray([merged_pos[t] for t in old_vocab], np.int32)
        new_map = np.asarray([merged_pos[t] for t in new_vocab_l], np.int32)
        pair_terms = np.concatenate([
            old_map[old_terms] if len(old_terms) else old_terms,
            new_map[new_terms] if len(new_terms) else new_terms,
        ])
        pair_counts = np.concatenate([old_counts, new_counts])
        doc_indptr = np.concatenate([old_indptr, new_indptr[1:] + old_indptr[-1]])
        doc_len = np.concatenate([old_len, new_len])
        df = np.zeros(len(merged), np.int32)
        if len(old_df):
            np.add.at(df, old_map, old_df)
        if len(new_df):
            np.add.at(df, new_map, new_df)
        counted = (merged, df, doc_indptr, pair_terms, pair_counts, doc_len)
        index = self._from_counts(
            counted, len(old_len) + len(new_len), self.params
        )
        index._counted = counted
        return index

    @staticmethod
    def _count_terms(texts: list[str]):
        """→ (vocab list, df [V], doc_indptr [n+1], pair_terms [nnz],
        pair_counts [nnz], doc_len [n])"""
        from ..native import build_corpus_native

        native = build_corpus_native(texts)
        if native is not None:
            return native
        # pure-Python fallback
        vocab_map: dict[str, int] = {}
        terms_list: list[str] = []
        pair_terms: list[int] = []
        pair_counts: list[int] = []
        doc_indptr = [0]
        doc_len = []
        for text in texts:
            counts: dict[int, int] = {}
            toks = tokenize(text)
            doc_len.append(len(toks))
            for t in toks:
                tid = vocab_map.get(t)
                if tid is None:
                    tid = len(terms_list)
                    vocab_map[t] = tid
                    terms_list.append(t)
                counts[tid] = counts.get(tid, 0) + 1
            pair_terms.extend(counts.keys())
            pair_counts.extend(counts.values())
            doc_indptr.append(len(pair_terms))
        order = sorted(range(len(terms_list)), key=lambda i: terms_list[i])
        remap = np.zeros(len(terms_list), np.int32)
        for rank, old in enumerate(order):
            remap[old] = rank
        pair_terms_arr = remap[np.asarray(pair_terms, np.int32)] if pair_terms else np.zeros(0, np.int32)
        vocab = [terms_list[i] for i in order]
        df = np.zeros(len(vocab), np.int32)
        np.add.at(df, pair_terms_arr, 1)
        return (
            vocab,
            df,
            np.asarray(doc_indptr, np.int64),
            pair_terms_arr,
            np.asarray(pair_counts, np.int32),
            np.asarray(doc_len, np.int32),
        )

    @classmethod
    def _from_counts(cls, counted, n_docs: int, params: BM25Params) -> "BM25Index":
        vocab_list, df, doc_indptr, pair_terms, pair_counts, doc_len = counted
        v = len(vocab_list)
        vocab = {t: i for i, t in enumerate(vocab_list)}
        avgdl = max(float(doc_len.mean()) if n_docs else 1.0, 1e-6)
        df_f = np.maximum(df.astype(np.float64), 0)
        idf = np.log(1.0 + (n_docs - df_f + 0.5) / (df_f + 0.5)).astype(np.float32)

        # vectorized weights: w = tf(k1+1) / (tf + k1(1-b+b·len/avgdl))
        k1, b = params.k1, params.b
        nnz = len(pair_terms)
        doc_of_pair = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(doc_indptr)
        )
        tf = pair_counts.astype(np.float32)
        norm = (k1 * (1.0 - b + b * doc_len[doc_of_pair] / avgdl)).astype(np.float32)
        w = tf * (k1 + 1.0) / (tf + norm)

        # group by term, impact-ordered (weight descending) within term
        order = np.lexsort((-w, pair_terms)) if nnz else np.zeros(0, np.int64)
        sorted_terms = pair_terms[order]
        sorted_docs = doc_of_pair[order].astype(np.int32)
        sorted_w = w[order]
        counts_per_term = np.bincount(sorted_terms, minlength=v)
        capped = np.minimum(counts_per_term, params.p_max)
        term_len = capped.astype(np.int32)
        term_start = np.zeros(v, np.int32)
        term_start[1:] = np.cumsum(capped[:-1]).astype(np.int32)
        # build keep mask: within-term rank < p_max
        starts_full = np.zeros(v, np.int64)
        starts_full[1:] = np.cumsum(counts_per_term[:-1])
        rank_in_term = np.arange(nnz, dtype=np.int64) - starts_full[sorted_terms]
        keep = rank_in_term < params.p_max
        docs_out = sorted_docs[keep]
        w_out = sorted_w[keep]
        pad = params.p_max
        post_docs = np.concatenate([docs_out, np.full(pad, n_docs, np.int32)])
        post_w = np.concatenate([w_out, np.zeros(pad, np.float32)]).astype(np.float32)

        return cls(
            vocab, term_start, term_len, post_docs, post_w, idf,
            n_docs, params, avgdl,
        )

    # ---------------- query ----------------

    def _encode_queries_np(
        self, queries: list[str], max_terms: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Host-side query encoding (callers that reorder/inspect terms
        use this to avoid a device round-trip before upload)."""
        cfg = get_config()
        t_max = max_terms or cfg.BM25_MAX_QUERY_TERMS
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
        return qterms, qtf

    def encode_queries(
        self, queries: list[str], max_terms: int | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Map query strings to padded ``(qterms [Q,T] i32, qtf [Q,T] f32)``."""
        qterms, qtf = self._encode_queries_np(queries, max_terms)
        return jnp.asarray(qterms), jnp.asarray(qtf)

    def scores(self, queries: list[str]) -> jnp.ndarray:
        from ..ops.bm25 import bm25_scores

        qterms, qtf = self.encode_queries(queries)
        return bm25_scores(
            qterms, qtf, self.term_start, self.term_len,
            self.post_docs, self.post_w, self.idf,
            n_docs=self.n_docs, p_max=self.params.p_max,
        )

    def topk(self, queries: list[str], k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Row-layout kernel (two aligned row gathers), packed-key
        aggregation when n_docs fits the i32 key (half the sort bytes —
        the fast TPU path; ~1e-3 relative quantization, top-10 overlap
        ≥0.999 vs exact), exact f32 aggregation otherwise. Queries whose
        hot-term count fits T/2 additionally pack hot terms FIRST so the
        wide gather (and the dominant sort) covers half the term slots
        (ops/bm25._gather_rows hot_cap)."""
        qt, qf, arrays, statics = self.topk_plan(queries)
        return bm25_dispatch(qt, qf, arrays, k=k, **statics)

    def topk_plan(
        self, queries: list[str]
    ) -> tuple[jnp.ndarray, jnp.ndarray, tuple, dict]:
        """Host-side query prep shared by :meth:`topk` and the hybrid
        engine's fused one-launch program: encodes queries, applies the
        hot-first reorder ON HOST (fetching device arrays back for the
        hot check would cost two tunnel round-trips), and returns
        ``(qt, qf, device_arrays, statics)`` for
        :func:`bm25_dispatch`."""
        qt_np, qf_np = self._encode_queries_np(queries)
        rows = self._row_layout()
        packed = self.n_docs < 1 << 20  # 31 − qbits(11)
        hot_cap = None
        if packed:
            hot_np = rows["term_hot_np"]
            is_hot = (qt_np >= 0) & hot_np[np.maximum(qt_np, 0)]
            t = qt_np.shape[1]
            cap = t // 2
            if cap >= 1 and int(is_hot.sum(axis=1).max(initial=0)) <= cap:
                order = np.argsort(~is_hot, axis=1, kind="stable")
                qt_np = np.take_along_axis(qt_np, order, 1)
                qf_np = np.take_along_axis(qf_np, order, 1)
                hot_cap = cap
        arrays = (
            rows["term_row"], rows["term_hot"],
            rows["hot_docs"], rows["hot_w"],
            rows["cold_docs"], rows["cold_w"],
            self.idf, rows["term_wmax"],
        )
        statics = dict(packed=packed, n_docs=self.n_docs, hot_cap=hot_cap)
        return jnp.asarray(qt_np), jnp.asarray(qf_np), arrays, statics

    # ---------------- persistence ----------------

    def save(self, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            term_start=np.asarray(self.term_start),
            term_len=np.asarray(self.term_len),
            post_docs=np.asarray(self.post_docs),
            post_w=np.asarray(self.post_w),
            idf=np.asarray(self.idf),
        )
        meta = {
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "k1": self.params.k1,
            "b": self.params.b,
            "p_max": self.params.p_max,
            "vocab": self.vocab,
        }
        Path(str(path) + ".meta.json").write_text(
            json.dumps(meta, ensure_ascii=False), encoding="utf-8"
        )

    @classmethod
    def load(cls, path: Path | str) -> "BM25Index":
        path = Path(path)
        arrays = np.load(str(path) if str(path).endswith(".npz") else f"{path}.npz")
        meta = json.loads(Path(str(path) + ".meta.json").read_text(encoding="utf-8"))
        return cls(
            vocab=meta["vocab"],
            term_start=arrays["term_start"],
            term_len=arrays["term_len"],
            post_docs=arrays["post_docs"],
            post_w=arrays["post_w"],
            idf=arrays["idf"],
            n_docs=meta["n_docs"],
            params=BM25Params(k1=meta["k1"], b=meta["b"], p_max=meta["p_max"]),
            avgdl=meta["avgdl"],
        )
