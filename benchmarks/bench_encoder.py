"""Embedding throughput: batched encoder forwards (ingest-side docs/s and
query-side single/low-batch latency) — the compute the reference spends
in sentence-transformers on CPU (providers/hf/embeddings.py)."""

import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import emit


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = ensure_backend()
    from intool_rag_tpu.models.encoder import EncoderConfig, encode_fn, init_params

    if backend == "tpu":
        config = EncoderConfig(
            vocab_size=32_768, hidden_size=384, num_layers=6, num_heads=6,
            intermediate_size=1536, max_position=2050, dtype="bfloat16",
        )
        batch, seq = 128, 512
    else:
        config = EncoderConfig.tiny()
        batch, seq = 32, 64
    params = init_params(config)
    fn = jax.jit(encode_fn(config))

    make = jax.jit(
        lambda k: jax.random.randint(k, (batch, seq), 4, config.vocab_size)
    )
    batches = [make(jax.random.PRNGKey(i)) for i in range(4)]
    mask = jnp.ones((batch, seq), jnp.int32)
    np.asarray(fn(params, batches[-1], mask))
    times = []
    for ids in batches[:3]:
        t0 = time.perf_counter()
        np.asarray(fn(params, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    emit(
        "encoder_docs_per_s", batch / dt, "docs/s",
        backend=backend, layers=config.num_layers, hidden=config.hidden_size,
        seq=seq, batch=batch, tokens_per_s=round(batch * seq / dt),
    )

    # provider-level padded vs packed encode on a realistic chunk-length
    # mix (EMBED_PACKED, models/packing.py): the padded path pays the
    # per-batch max-length bucket, packing pays ~the mean length
    from intool_rag_tpu.providers.tpu_embed import TPUEmbeddingProvider

    provider = TPUEmbeddingProvider(config=config)  # random params: FLOPs identical
    rng = np.random.default_rng(0)
    vocab_words = [f"w{i}" for i in range(5000)]
    n_texts = 512 if backend == "tpu" else 48
    lens = np.clip(
        rng.lognormal(5.0, 0.6, size=3 * n_texts).astype(int), 20, 480
    )
    all_texts = [" ".join(rng.choice(vocab_words, s)) for s in lens]
    rounds = [all_texts[i * n_texts : (i + 1) * n_texts] for i in range(3)]
    for packed in (False, True):
        provider.packed = packed
        provider.embed_batch(rounds[0][:64])  # compile
        times = []
        for texts in rounds:
            t0 = time.perf_counter()
            provider.embed_batch(texts)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        emit(
            f"encoder_provider_docs_per_s_{'packed' if packed else 'padded'}",
            n_texts / dt, "docs/s", backend=backend,
            mean_len=round(float(np.mean(lens)), 1),
        )

    # query-side latency (batch 8, short)
    q_ids = jax.random.randint(jax.random.PRNGKey(9), (8, 32), 4, config.vocab_size)
    q_mask = jnp.ones((8, 32), jnp.int32)
    np.asarray(fn(params, q_ids, q_mask))
    t0 = time.perf_counter()
    np.asarray(fn(params, q_ids + 1, q_mask))
    emit("encoder_query_latency_ms_b8", (time.perf_counter() - t0) * 1000, "ms",
         backend=backend)


if __name__ == "__main__":
    main()
