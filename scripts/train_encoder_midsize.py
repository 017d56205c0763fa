"""Scale the self-trained encoder toward the benched 6L/384h config
(round-4 verdict item 4c: the serving stand-in was 2L/64h, vocab 2048,
24-token truncation — far below the architecture the benches measure).

Training data: unique positives from FOUR independent draws of the
GRADED relevance family (seeds 1001–1004) plus one shuffled copy per
passage (word-order robustness). Evaluation: the seed-0 graded task —
a corpus the encoder never saw, so the split is at the corpus level
while the qtop↔dtop association vocabulary (the trained knowledge)
transfers. Also evaluates OOD (seed-0 family) and serves the
checkpoint through the real provider path (EMBEDDING_CHECKPOINT).

Runs on TPU when the tunnel is claimable (cached-pool scan trainer —
one RPC per 100 steps); falls back to CPU identically (quality is
hardware-blind, just slower).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_encoder_midsize.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

from intool_rag_tpu.backend import ensure_backend

OUT = Path(
    "intool_rag_tpu/models/weights/encoder_mid_v2.npz"
    if os.environ.get("ENC_MID_V2")
    else "intool_rag_tpu/models/weights/encoder_mid.npz"
)


def collect_pairs(seeds, rng, hard_seeds=()):
    from intool_rag_tpu.eval.synthetic import make_relevance_task_graded

    seen, qs, ps = set(), [], []
    draws = [(seed, {}) for seed in seeds] + [
        # hard-tier draws (round 5): decoy-rich, bigger corpora — the
        # same 80-topic association vocabulary, harder surface
        (seed, dict(n_ctx=64, docs_per_ctx=32, decoy_prob=0.8))
        for seed in hard_seeds
    ]
    for seed, kw in draws:
        task = make_relevance_task_graded(
            np.random.default_rng(seed), n_train_queries=600, **kw
        )
        for q, p, lab in zip(task.train_queries, task.train_passages,
                             task.train_labels):
            if lab > 0.5 and (q, p) not in seen:
                seen.add((q, p))
                qs.append(q)
                ps.append(p)
    aug_q, aug_p = [], []
    for q, p in zip(qs, ps):
        w = p.split()
        rng.shuffle(w)
        aug_q.append(q)
        aug_p.append(" ".join(w))
    return qs + aug_q, ps + aug_p


def main() -> None:
    backend = ensure_backend()
    import jax

    from intool_rag_tpu.eval.harness import (
        build_engine_from_texts,
        evaluate_engine,
    )
    from intool_rag_tpu.eval.synthetic import (
        make_relevance_task_graded,
        make_relevance_task_ood,
    )
    from intool_rag_tpu.models.encoder import (
        EncoderConfig,
        encode_fn,
        save_encoder_checkpoint,
    )
    from intool_rag_tpu.models.tokenizer import SimpleTokenizer
    from intool_rag_tpu.train.contrastive import (
        tokenize_pairs,
        train_encoder_cached,
    )

    on_tpu = backend == "tpu"
    config = EncoderConfig(
        vocab_size=8192, hidden_size=384, num_layers=6, num_heads=6,
        intermediate_size=1536, max_position=2050, dtype="float32",
        flash_min_len=0,
    )
    max_len = 48
    rng = np.random.default_rng(99)
    hard = (2001, 2002, 2003, 2004) if os.environ.get("ENC_MID_V2") else ()
    qs, ps = collect_pairs((1001, 1002, 1003, 1004), rng, hard_seeds=hard)
    print(f"# {len(qs)} training pairs (incl. shuffled copies)",
          file=sys.stderr, flush=True)
    tok = SimpleTokenizer(vocab_size=config.vocab_size, max_length=max_len)
    pool = tokenize_pairs(tok, qs, ps, max_len=max_len)

    steps = (8000 if os.environ.get("ENC_MID_V2") else 4000) if on_tpu else 1200
    t0 = time.time()
    params, losses = train_encoder_cached(
        config, pool, steps=steps, batch=128 if on_tpu else 64, lr=5e-4,
        steps_per_launch=100,
    )
    print(
        f"# trained {steps} steps in {time.time()-t0:.0f}s on {backend}: "
        f"loss {losses[0]:.3f} -> {losses[-1]:.3f}",
        file=sys.stderr, flush=True,
    )

    OUT.parent.mkdir(parents=True, exist_ok=True)
    save_encoder_checkpoint(OUT, config, params, store_dtype="float16")
    print(f"# checkpoint: {OUT} ({OUT.stat().st_size/1e6:.1f} MB)",
          file=sys.stderr, flush=True)

    # serve through the REAL provider path (checkpoint dictates dims)
    os.environ["EMBEDDING_CHECKPOINT"] = str(OUT)
    os.environ["EMBEDDING_PROVIDER"] = "tpu"
    os.environ["EMBEDDING_QUERY_INSTRUCTION"] = ""
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider(model_name="self-trained-mid")
    assert provider.dimension == 384, provider.dimension

    print("| family | provider | mode | recall@10 | MRR | NDCG@10 |")
    print("|---|---|---|---|---|---|")
    for fam, task in (
        ("graded", make_relevance_task_graded(np.random.default_rng(0))),
        ("hard-graded", make_relevance_task_graded(
            np.random.default_rng(0), n_ctx=64, docs_per_ctx=32,
            decoy_prob=0.8, n_eval=96)),
        ("ood", make_relevance_task_ood(np.random.default_rng(0))),
    ):
        eng = build_engine_from_texts(task.texts, provider)
        res = evaluate_engine(
            eng, provider, task.examples, k=10, modes=("dense", "hybrid")
        )
        for mode, m in res.items():
            print(
                f"| {fam} | mid-enc(6L/384h) | {mode} | {m['recall@k']:.3f} "
                f"| {m['mrr']:.3f} | {m['ndcg@k']:.3f} |", flush=True,
            )


if __name__ == "__main__":
    main()
