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

    # ---------------- build ----------------

    @classmethod
    def build(
        cls, texts: list[str], params: BM25Params | None = None
    ) -> "BM25Index":
        params = params or BM25Params.from_config()
        n_docs = len(texts)
        doc_terms: list[dict[str, int]] = []
        doc_len = np.zeros(n_docs, np.float64)
        for i, text in enumerate(texts):
            terms = tokenize(text)
            doc_len[i] = len(terms)
            counts: dict[str, int] = {}
            for t in terms:
                counts[t] = counts.get(t, 0) + 1
            doc_terms.append(counts)
        avgdl = float(doc_len.mean()) if n_docs else 1.0
        avgdl = max(avgdl, 1e-6)

        # vocab + df
        df: dict[str, int] = {}
        for counts in doc_terms:
            for t in counts:
                df[t] = df.get(t, 0) + 1
        vocab = {t: i for i, t in enumerate(sorted(df))}
        v = len(vocab)

        idf = np.zeros(v, np.float32)
        for t, tid in vocab.items():
            idf[tid] = np.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))

        # postings: per term, (doc, weight) impact-ordered, capped at p_max
        postings: list[list[tuple[float, int]]] = [[] for _ in range(v)]
        k1, b = params.k1, params.b
        for d, counts in enumerate(doc_terms):
            norm = k1 * (1.0 - b + b * doc_len[d] / avgdl)
            for t, tf in counts.items():
                w = tf * (k1 + 1.0) / (tf + norm)
                postings[vocab[t]].append((-w, d))  # negative for ascending sort
        term_start = np.zeros(v, np.int32)
        term_len = np.zeros(v, np.int32)
        docs_out: list[int] = []
        w_out: list[float] = []
        for tid in range(v):
            plist = sorted(postings[tid])[: params.p_max]
            term_start[tid] = len(docs_out)
            term_len[tid] = len(plist)
            docs_out.extend(d for _, d in plist)
            w_out.extend(-w for w, _ in plist)
        # tail padding so dynamic_slice(start, p_max) is always in bounds
        pad = params.p_max
        post_docs = np.asarray(docs_out + [n_docs] * pad, np.int32)
        post_w = np.asarray(w_out + [0.0] * pad, np.float32)

        return cls(
            vocab, term_start, term_len, post_docs, post_w, idf,
            n_docs, params, avgdl,
        )

    # ---------------- query ----------------

    def encode_queries(
        self, queries: list[str], max_terms: int | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Map query strings to padded ``(qterms [Q,T] i32, qtf [Q,T] f32)``."""
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
        from ..ops.bm25 import bm25_topk

        qterms, qtf = self.encode_queries(queries)
        return bm25_topk(
            qterms, qtf, self.term_start, self.term_len,
            self.post_docs, self.post_w, self.idf, k,
            n_docs=self.n_docs, p_max=self.params.p_max,
        )

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
