"""Retrieval-quality matrix: hash vs self-trained × in-dist vs OOD vs
GRADED (round-4 verdict item 4).

Produces the markdown table for BENCH_NOTES: every provider/mode row on
the three synthetic families (eval/synthetic.py):

- ``indist`` — the original 40-topic family (saturated by trained rows
  in round 4: recall 1.000 — kept for continuity),
- ``ood``    — same association vocabulary, shifted surface (disjoint
  filler, shuffled order, longer docs, decoys),
- ``graded`` — the de-saturated family: 80 topics with sibling-topic
  near-misses (gain 1 vs 3), single-mention evidence in 3× filler,
  noisy queries; NDCG is graded.

Quality is hardware-independent — forces the CPU backend so a TPU
benchmark can run concurrently (single-tenant tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_quality_matrix.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from intool_rag_tpu.eval.harness import (  # noqa: E402
    build_engine_from_texts,
    evaluate_engine,
)
from intool_rag_tpu.eval.synthetic import (  # noqa: E402
    make_relevance_task,
    make_relevance_task_graded,
    make_relevance_task_ood,
)
from intool_rag_tpu.models.encoder import EncoderConfig  # noqa: E402
from intool_rag_tpu.models.reranker import Reranker  # noqa: E402
from intool_rag_tpu.models.tokenizer import SimpleTokenizer  # noqa: E402
from intool_rag_tpu.train.contrastive import (  # noqa: E402
    tokenize_pairs,
    train_encoder_cached,
)
from intool_rag_tpu.train.rerank import build_pair_pool, train_reranker  # noqa: E402


# the SHIPPED offline provider (signed hashing + char 3-grams) — the
# baseline rows must measure what EMBEDDING_PROVIDER=hash actually
# serves (round-5 review: an earlier bespoke unigram hasher here
# understated the baseline's partial topic signal from char n-grams)
from intool_rag_tpu.providers.hash_embed import (  # noqa: E402
    HashEmbeddingProvider as HashProvider,
)


class EncoderProvider:
    """Minimal provider over a trained TextEncoder (eval-side only)."""

    def __init__(self, config, params, tokenizer):
        from intool_rag_tpu.models.encoder import encode_fn

        self.fn = jax.jit(encode_fn(config))
        self.params = params
        self.tok = tokenizer

    def embed_batch(self, texts, is_query=False):
        ids, mask = self.tok.encode_batch(texts)
        import jax.numpy as jnp

        return np.asarray(self.fn(self.params, jnp.asarray(ids), jnp.asarray(mask)))


def unique_positives(task, rng, *, augment=True):
    seen, qs, ps = set(), [], []
    for q, p, lab in zip(task.train_queries, task.train_passages,
                         task.train_labels):
        if lab > 0.5 and (q, p) not in seen:
            seen.add((q, p))
            qs.append(q)
            ps.append(p)
    if augment:  # one shuffled copy (OOD word-order robustness)
        extra_q, extra_p = [], []
        for q, p in zip(qs, ps):
            w = p.split()
            rng.shuffle(w)
            extra_q.append(q)
            extra_p.append(" ".join(w))
        qs += extra_q
        ps += extra_p
    return qs, ps


def train_encoder_for(task, rng, *, steps=900):
    config = EncoderConfig(
        vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=48, dtype="float32",
    )
    tok = SimpleTokenizer(vocab_size=2048, max_length=24)
    qs, ps = unique_positives(task, rng)
    pool = tokenize_pairs(tok, qs, ps, max_len=24)
    t0 = time.time()
    params, losses = train_encoder_cached(
        config, pool, steps=steps, batch=64, lr=1e-3
    )
    print(
        f"# encoder: {len(qs)} pairs, {steps} steps in {time.time()-t0:.0f}s"
        f" loss {losses[0]:.2f}->{losses[-1]:.2f}",
        file=sys.stderr,
    )
    return EncoderProvider(config, params, tok)


def train_reranker_for(task, rng, *, steps=1200):
    config = EncoderConfig(
        vocab_size=2048, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=48, dtype="float32",
    )
    tok = SimpleTokenizer(vocab_size=2048, max_length=40)
    pool = build_pair_pool(
        tok, task.train_queries, task.train_passages, task.train_labels,
        max_len=36, augment_shuffle=1, rng=rng,
    )
    t0 = time.time()
    params = train_reranker(config, pool, steps=steps, batch=64, lr=1e-3)
    print(f"# reranker: {steps} steps in {time.time()-t0:.0f}s",
          file=sys.stderr)
    return Reranker.create(config=config, tokenizer=tok, params=params)


def main():
    rng = np.random.default_rng(0)
    hashp = HashProvider()
    indist = make_relevance_task(rng)
    ood = make_relevance_task_ood(rng)
    graded = make_relevance_task_graded(rng)

    enc_indist = train_encoder_for(indist, rng)
    rr_indist = train_reranker_for(indist, rng)
    enc_graded = train_encoder_for(graded, rng, steps=1500)
    rr_graded = train_reranker_for(graded, rng, steps=1800)

    rows = []

    def add(family, task, provider, pname, modes, reranker=None):
        eng = build_engine_from_texts(task.texts, provider)
        res = evaluate_engine(
            eng, provider, task.examples, k=10, modes=modes,
            reranker=reranker, rerank_candidates=30,
        )
        for mode, m in res.items():
            rows.append((family, pname, mode, m))
            print(f"| {family} | {pname} | {mode} | {m['recall@k']:.3f} "
                  f"| {m['mrr']:.3f} | {m['ndcg@k']:.3f} |", flush=True)

    print("| family | provider | mode | recall@10 | MRR | NDCG@10 |")
    print("|---|---|---|---|---|---|")
    for fam, task in (("indist", indist), ("ood", ood), ("graded", graded)):
        add(fam, task, hashp, "hash", ("dense", "hybrid"))
    add("indist", indist, enc_indist, "trained-enc", ("dense",))
    add("ood", ood, enc_indist, "trained-enc", ("dense",))
    add("indist", indist, hashp, "hash", ("rerank",), reranker=rr_indist)
    add("ood", ood, hashp, "hash", ("rerank",), reranker=rr_indist)
    add("graded", graded, enc_graded, "trained-enc", ("dense", "hybrid"))
    add("graded", graded, hashp, "hash", ("rerank",), reranker=rr_graded)
    # the composed production pipeline: trained first-stage retrieval
    # feeding the trained cross-encoder — on the graded family the
    # binding constraint is the candidate pool (hash hybrid recall@30 is
    # the rerank ceiling), so composition is where the headroom is
    add("graded", graded, enc_graded, "trained-enc", ("rerank",),
        reranker=rr_graded)
    add("ood", ood, enc_indist, "trained-enc", ("rerank",),
        reranker=rr_indist)


if __name__ == "__main__":
    main()
