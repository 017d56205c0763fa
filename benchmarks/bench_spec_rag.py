"""Speculative decoding on RAG-style text: net speedup, real acceptance
(round-3 verdict item 7 — the ≥2 tokens/wave claim came from a pure
copy-task model; RAG answers quote a question-dependent span).

Trains a mid-size decoder on doc+question+quoted-answer sequences
(models/lm_train.py rag_qa_batch — lookup-and-copy, the extractive-QA
structure), then serves held-out RAG-style prompts through the
continuous-batching scheduler with and without batched prompt-lookup
waves. Reports tokens/s, tokens/wave, and the net speedup — the README
claim ("RAG answers quote retrieved context, so drafts hit") measured
end-to-end instead of extrapolated.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_spec_rag.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit  # noqa: E402


def main() -> None:
    backend = ensure_backend()
    from intool_rag_tpu.models.decoder import DecoderConfig
    from intool_rag_tpu.models.lm_train import rag_qa_prompts, train_rag_qa_lm
    from intool_rag_tpu.models.scheduler import ContinuousGenerator

    on_tpu = backend == "tpu"
    config = DecoderConfig(
        vocab_size=512,
        hidden_size=512 if on_tpu else 64,
        num_layers=8 if on_tpu else 2,
        num_heads=8 if on_tpu else 4,
        num_kv_heads=4 if on_tpu else 2,
        intermediate_size=1408 if on_tpu else 128,
        max_position=1024,
        dtype="bfloat16" if on_tpu else "float32",
    )
    n_fields, val_len = 4, 9
    steps = 6000 if on_tpu else 300
    t0 = time.perf_counter()
    # warmup + clip + 6e-4: the round-4 run at cold-start 2e-3 plateaued
    # at near-unigram loss (6.69 → 5.58) and the answer-match stayed 0;
    # see train_lm docstring. Ideal loss for this mix ≈ 1.7 (document
    # tokens are random; only quoted spans + separators are predictable).
    params, losses = train_rag_qa_lm(
        config, steps=steps, batch=64 if on_tpu else 16, seq=96, seed=0,
        n_fields=n_fields, val_len=val_len,
        lr=6e-4 if on_tpu else 2e-3, warmup=300 if on_tpu else 0,
        clip=1.0,
    )
    print(
        f"# trained {steps} steps in {time.perf_counter() - t0:.0f}s: "
        f"loss {losses[0]:.3f} -> {losses[-1]:.3f}",
        file=sys.stderr,
    )

    data_rng = np.random.default_rng(7)
    n_prompts = 64 if on_tpu else 8
    prompts, answers = rag_qa_prompts(
        data_rng, n_prompts, config.vocab_size, n_fields=n_fields,
        val_len=val_len,
    )
    limits = [24] * len(prompts)

    def run(gen):
        # warmup/compile on a small slice, then time the full batch
        gen.generate_many(prompts[:4], [24] * 4)
        t0 = time.perf_counter()
        out, stats = gen.generate_many(prompts, limits)
        dt = time.perf_counter() - t0
        return out, stats, sum(len(o) for o in out) / dt

    n_slots = 16 if on_tpu else 4
    plain = ContinuousGenerator(config, params, n_slots=n_slots, seg_len=8)
    want, _, tps_plain = run(plain)
    frac = np.mean([
        np.mean(np.asarray(w[:val_len]) == np.asarray(a))
        for w, a in zip(want, answers)
    ])
    spec = ContinuousGenerator(
        config, params, n_slots=n_slots, seg_len=8, speculative_gamma=4,
        lookup_window=128,
    )
    got, stats, tps_spec = run(spec)
    emit("spec_rag_answer_token_match", float(frac), "fraction",
         backend=backend)
    # Parity contract: bit-exact in f32 (tests/test_scheduler.py); in
    # bf16 the verify forward (γ tokens/slot) and the plain decode
    # forward (1 token/slot) tile matmuls differently on the MXU, so
    # near-tie logits can argmax differently — quality must match, the
    # bitstream need not. Measure both.
    prefix = []
    for g_row, w_row in zip(got, want):
        n = min(len(g_row), len(w_row))
        same = next((i for i in range(n) if g_row[i] != w_row[i]), n)
        prefix.append(same / max(len(w_row), 1))
    emit("spec_rag_greedy_prefix_match", float(np.mean(prefix)), "fraction",
         backend=backend, exact_seqs=sum(g == w for g, w in zip(got, want)))
    frac_spec = np.mean([
        np.mean(np.asarray(g[:val_len]) == np.asarray(a))
        for g, a in zip(got, answers)
    ])
    emit("spec_rag_answer_token_match_spec", float(frac_spec), "fraction",
         backend=backend)
    if config.dtype == "float32":
        assert got == want, "speculative output diverged from plain greedy"
    else:
        assert frac_spec >= frac - 0.05, (
            f"speculative quality regressed vs plain greedy: "
            f"{frac_spec:.3f} < {frac:.3f} - 0.05"
        )
    emit("spec_rag_plain_tok_s", tps_plain, "tokens/s", backend=backend,
         n_slots=n_slots, prompts=len(prompts))
    emit("spec_rag_spec_tok_s", tps_spec, "tokens/s", backend=backend,
         gamma=4, tokens_per_wave=round(stats.get("tokens_per_wave", 0), 3))
    emit("spec_rag_net_speedup", tps_spec / tps_plain, "x",
         backend=backend)

    # A/B the launch-amortization lever (round 5): the default
    # seg_len//gamma waves/launch emits FEWER tokens per launch than
    # plain decoding (4.5 vs 8 here), so on remote-dispatch transports
    # "speculation loses" was really "wave segments amortize launches
    # worse". Full-seg_len waves burn cursor 4x faster but emit ~2.2x
    # plain's tokens per launch.
    import os

    os.environ["SPEC_WAVES_PER_SEGMENT"] = "8"
    try:
        spec_wide = ContinuousGenerator(
            config, params, n_slots=n_slots, seg_len=8,
            speculative_gamma=4, lookup_window=128,
        )
    finally:
        del os.environ["SPEC_WAVES_PER_SEGMENT"]
    got_w, stats_w, tps_wide = run(spec_wide)
    frac_wide = np.mean([
        np.mean(np.asarray(g[:val_len]) == np.asarray(a))
        for g, a in zip(got_w, answers)
    ])
    assert frac_wide >= frac - 0.05, (
        f"wide-wave speculative quality regressed: {frac_wide:.3f}"
    )
    emit("spec_rag_spec_wide_tok_s", tps_wide, "tokens/s", backend=backend,
         gamma=4, waves_per_segment=8,
         tokens_per_wave=round(stats_w.get("tokens_per_wave", 0), 3))
    emit("spec_rag_net_speedup_wide", tps_wide / tps_plain, "x",
         backend=backend)


if __name__ == "__main__":
    main()
