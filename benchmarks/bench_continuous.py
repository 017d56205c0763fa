"""Continuous batching vs static batching (round-2 verdict item 7).

Workload: many short generation requests with VARIABLE completion
lengths (the realistic serving mix — uniform 16..128 new tokens).
Static batching pads every stream in a batch to the longest request and
leaves finished slots idle; the slot scheduler refills them mid-flight.

Done-bar from the verdict: multi-tenant tokens/s ≥ 2× static batch-8 at
p50 per-stream latency within 1.5×.

Usage: PYTHONPATH=. python benchmarks/bench_continuous.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax

    from intool_rag_tpu.models.decoder import (
        DecoderConfig,
        cast_params_for_inference,
        init_decoder_params,
        make_generate_fn,
    )
    from intool_rag_tpu.models.scheduler import ContinuousGenerator

    on_tpu = backend == "tpu"
    config = (
        DecoderConfig.tinyllama()
        if on_tpu
        else DecoderConfig(
            vocab_size=512, hidden_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=256, max_position=2048,
            dtype="float32",
        )
    )
    # serving params: one-time bf16 cast (halves per-step HBM reads) —
    # applied to BOTH sides so the comparison stays fair
    params = cast_params_for_inference(config, init_decoder_params(config))
    rng = np.random.default_rng(0)
    n_requests = int(
        os.environ.get("BENCH_REQUESTS", 48 if on_tpu else 12)
    )
    prompt_len = 96
    prompts = [
        rng.integers(5, config.vocab_size - 1, size=prompt_len).tolist()
        for _ in range(n_requests)
    ]
    limits = [int(rng.integers(16, 129)) for _ in range(n_requests)]
    total_tokens = sum(limits)

    # ---- static batch-8 baseline: ONE compiled fn at the workload max
    # (standard static serving: every stream pads to the longest) ----
    batch = 8
    max_new = max(limits)
    fn = make_generate_fn(config, max_new_tokens=max_new, temperature=0.0)
    warm = np.zeros((batch, 128), np.int32)
    warm_m = np.zeros((batch, 128), np.int32)
    warm[:, 128 - prompt_len:] = prompts[0]
    warm_m[:, 128 - prompt_len:] = 1
    np.asarray(fn(params, warm, warm_m, jax.random.PRNGKey(0)))  # compile
    t0 = time.perf_counter()
    static_lat = []
    for s in range(0, n_requests, batch):
        idx = list(range(s, min(s + batch, n_requests)))
        arr = np.zeros((batch, 128), np.int32)
        mask = np.zeros((batch, 128), np.int32)
        for j, i in enumerate(idx):
            arr[j, 128 - prompt_len:] = prompts[i]
            mask[j, 128 - prompt_len:] = 1
        t_b = time.perf_counter()
        np.asarray(fn(params, arr, mask, jax.random.PRNGKey(s)))
        t_done = time.perf_counter()
        static_lat.extend([t_done - t_b] * len(idx))
    static_wall = time.perf_counter() - t0
    static_tps = total_tokens / static_wall

    # ---- continuous batching: 16 slots, segment refill. The slot
    # count is where continuous batching structurally wins: static
    # serving can't grow its batch without padding every stream to the
    # longest, while slot refill keeps utilization high at any width
    # (decode is param-read bound, so a 16-wide step costs ≈ an 8-wide
    # step) ----
    n_slots = int(os.environ.get("BENCH_SLOTS", 32 if on_tpu else 8))
    gen = ContinuousGenerator(config, params, n_slots=n_slots, seg_len=16)
    # warm EVERY compiled path the measured run will hit: the full-width
    # initial refill cycle, the small-width refill cycle (staggered
    # limits free a few slots per segment and the extra queued prompts
    # refill them), and the no-refill decode cycle (limits > seg_len)
    warm_n = n_slots + max(1, n_slots // 4)
    warm_limits = [
        gen.seg_len + 2 + 3 * (j % n_slots) for j in range(warm_n)
    ]
    gen.generate_many(prompts[:warm_n], warm_limits)
    results, stats = gen.generate_many(prompts, limits)
    assert all(len(r) == l for r, l in zip(results, limits))

    out = {
        "backend": backend,
        "model": f"{config.num_layers}L/{config.hidden_size}h",
        "requests": n_requests,
        "total_new_tokens": total_tokens,
        "static_batch8_tokens_per_s": round(static_tps, 1),
        "static_p50_latency_s": round(float(np.median(static_lat)), 3),
        "continuous_tokens_per_s": round(stats["tokens_per_s"], 1),
        "continuous_p50_latency_s": round(stats["p50_latency_s"], 3),
        "speedup": round(stats["tokens_per_s"] / static_tps, 2),
    }

    # ---- batched speculative waves (BENCH_GAMMA, default 4): same
    # request mix through the speculative scheduler; random weights
    # mostly reject drafts so this measures the wave-cost floor — with
    # real quoting workloads tokens_per_wave > 1 multiplies throughput
    gamma = int(os.environ.get("BENCH_GAMMA", 4))
    if gamma > 1:
        sgen = ContinuousGenerator(
            config, params, n_slots=n_slots, seg_len=16,
            speculative_gamma=gamma,
        )
        sgen.generate_many(prompts[:warm_n], warm_limits)
        sres, sstats = sgen.generate_many(prompts, limits)
        # Greedy parity: exact on CPU (same f32 reduction order). On TPU
        # the γ-wide verify matmul and the 1-token decode matmul tile
        # differently, so logits differ by ulps — and RANDOM weights put
        # near-uniform logits on knife-edge argmax ties that such ulps
        # legitimately flip, after which the streams diverge for real.
        # (With trained weights the margins are real: exact parity is
        # asserted in tests/test_scheduler.py on the copy-task model.)
        # Report mean prefix agreement instead of asserting equality.
        if backend == "tpu":
            agree = [
                next(
                    (i for i, (a, b) in enumerate(zip(r, s)) if a != b),
                    min(len(r), len(s)),
                )
                / max(len(r), 1)
                for r, s in zip(results, sres)
            ]
            out["speculative_prefix_agreement"] = round(
                float(np.mean(agree)), 3
            )
        else:
            assert sres == results  # greedy parity with the plain scheduler
        out["speculative"] = {
            "gamma": gamma,
            "tokens_per_s": round(sstats["tokens_per_s"], 1),
            "tokens_per_wave": round(sstats.get("tokens_per_wave", 0), 3),
            "p50_latency_s": round(sstats["p50_latency_s"], 3),
            "vs_plain_continuous": round(
                sstats["tokens_per_s"] / stats["tokens_per_s"], 2
            ),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
