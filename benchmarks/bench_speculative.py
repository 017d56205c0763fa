"""Prompt-lookup speculative decoding: hardware step-cost measurement
(ROADMAP #4).

Without real checkpoint weights (none downloadable offline) the
ACCEPTANCE RATE is workload-undefined — a random-weight model never
quotes its prompt. What IS hardware truth, and what this measures:

- t_plain: ms/token of the plain scan decoder (single stream),
- t_spec(γ): ms/STEP of the speculative loop when every draft rejects
  (each step then verifies γ tokens but emits 1 — the worst case and
  the per-step cost ceiling),
- the BREAK-EVEN mean acceptance m* = t_spec/t_plain − 1: a workload
  whose prompt-lookup drafts are accepted m̄ ≥ m* tokens/step runs
  faster speculatively; RAG answers quoting retrieved context typically
  accept most of γ−1 (llama.cpp prompt-lookup reports 2-3×).

Single-token decode is param-read bound, so t_spec should sit close to
t_plain even at γ=8 — that gap is the whole bet, and it is measurable
with any weights.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_speculative.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit

PROMPT = 128
NEW = 128


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        make_generate_fn,
        make_lookup_speculative_fn,
    )

    on_tpu = backend == "tpu"
    config = DecoderConfig(
        vocab_size=32000,
        hidden_size=2048 if on_tpu else 256,
        num_layers=22 if on_tpu else 4,
        num_heads=32 if on_tpu else 8,
        num_kv_heads=4,
        intermediate_size=5632 if on_tpu else 512,
        max_position=2048 if on_tpu else 512,
        dtype="bfloat16" if on_tpu else "float32",
    )
    params = init_decoder_params(config)

    def prompts(seed):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, 31000, (1, PROMPT)).astype(np.int32)
        return jnp.asarray(ids), jnp.ones((1, PROMPT), jnp.int32)

    # ---- plain scan decode ----
    gen = make_generate_fn(config, max_new_tokens=NEW)
    key = jax.random.PRNGKey(0)
    pi, pm = prompts(0)
    np.asarray(gen(params, pi, pm, key))  # compile
    times = []
    for i in range(3):
        pi, pm = prompts(i + 1)
        t0 = time.perf_counter()
        np.asarray(gen(params, pi, pm, key))
        times.append(time.perf_counter() - t0)
    t_plain = min(times) / NEW * 1000  # ms/token

    sweep = {}
    for gamma in (2, 4, 8):
        spec = make_lookup_speculative_fn(
            config, max_new_tokens=NEW, gamma=gamma
        )
        pi, pm = prompts(0)
        np.asarray(spec(params, pi, pm))  # compile
        times = []
        for i in range(3):
            pi, pm = prompts(i + 1)
            t0 = time.perf_counter()
            np.asarray(spec(params, pi, pm))
            times.append(time.perf_counter() - t0)
        # random prompts + random weights: drafts reject, 1 token/step,
        # NEW steps — so this IS the per-step cost
        t_step = min(times) / NEW * 1000
        sweep[gamma] = {
            "ms_per_step": round(t_step, 3),
            "overhead_vs_plain": round(t_step / t_plain, 3),
            "break_even_accept_tokens": round(t_step / t_plain - 1, 3),
            "speedup_at_full_accept": round(gamma / (t_step / t_plain), 2),
        }

    emit(
        "speculative_step_overhead_gamma4",
        sweep[4]["overhead_vs_plain"],
        "x plain decode step",
        backend=backend,
        dims=f"{config.num_layers}L/{config.hidden_size}h",
        plain_ms_per_token=round(t_plain, 3),
        sweep={str(g): v for g, v in sweep.items()},
    )


if __name__ == "__main__":
    main()
