"""Generative decoding benchmark: prefill tokens/s and decode tokens/s
for the in-process TPU LLM (models/decoder.py) at TinyLlama-1.1B
dimensions in bf16 (FLOPs are weight-independent — random init measures
real serving throughput).

Comparison point: the reference generates through Ollama running
llama-family models on CPU (rag/llm/providers/ollama.py; typical
llama.cpp CPU decode for a 1B model is ~10-30 tok/s/stream).

The whole generation (prefill + scan decode) is ONE jitted program, so
the ~40 ms axon launch RPC amortizes over all decode steps.
"""

import time

import numpy as np

from common import emit

from intool_rag_tpu.backend import ensure_backend

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
    )

    if backend == "tpu":
        cfg = DecoderConfig(max_position=PROMPT + NEW, dtype="bfloat16")
        batches = (1, 8, 32)
    else:
        cfg = DecoderConfig(
            vocab_size=1024, hidden_size=256, num_layers=4, num_heads=8,
            num_kv_heads=4, intermediate_size=512,
            max_position=PROMPT + NEW, dtype="float32",
        )
        batches = (1, 4)
    params = init_decoder_params(cfg)
    gen = make_generate_fn(cfg, max_new_tokens=NEW, temperature=0.0)

    for b in batches:
        rng = np.random.default_rng(b)
        variants = [
            (
                jnp.asarray(
                    rng.integers(4, cfg.vocab_size, (b, PROMPT)).astype(np.int32)
                ),
                jnp.ones((b, PROMPT), jnp.int32),
            )
            for _ in range(4)
        ]
        key = jax.random.PRNGKey(0)
        np.asarray(gen(params, *variants[-1], key))  # compile
        times = []
        for ids, mask in variants[:3]:
            t0 = time.perf_counter()
            np.asarray(gen(params, ids, mask, key))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        emit(
            f"decode_tok_per_s_batch{b}",
            b * NEW / dt,
            "tokens/s",
            backend=backend,
            layers=cfg.num_layers,
            hidden=cfg.hidden_size,
            prompt=PROMPT,
            new=NEW,
            ms_per_token_per_stream=round(dt / NEW * 1000, 2),
        )


if __name__ == "__main__":
    main()
