"""Continuous batching correctness: slot-refill generation must produce
the SAME greedy tokens as the static single-stream generator for every
prompt — streams sharing a cache must stay perfectly isolated (round-2
verdict item 7)."""

import numpy as np

import jax

from intool_rag_tpu.models.decoder import (
    DecoderConfig,
    init_decoder_params,
    make_generate_fn,
)
from intool_rag_tpu.models.scheduler import ContinuousGenerator


def _tiny_config():
    return DecoderConfig(
        vocab_size=257,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        intermediate_size=128,
        max_position=512,
        dtype="float32",
    )


def test_continuous_matches_static_greedy(rng):
    config = _tiny_config()
    params = init_decoder_params(config)
    n = 10
    prompts = [
        rng.integers(5, 250, size=int(rng.integers(4, 20))).tolist()
        for _ in range(n)
    ]
    limits = [int(rng.integers(3, 10)) for _ in range(n)]

    gen = ContinuousGenerator(config, params, n_slots=4, seg_len=4)
    results, stats = gen.generate_many(prompts, limits)

    # static reference: each prompt alone through make_generate_fn
    for i, (ids, limit) in enumerate(zip(prompts, limits)):
        bucket = 1 << max(3, (len(ids) - 1).bit_length())
        arr = np.zeros((1, bucket), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        arr[0, bucket - len(ids):] = ids
        mask[0, bucket - len(ids):] = 1
        fn = make_generate_fn(config, max_new_tokens=limit, temperature=0.0)
        want = np.asarray(
            fn(params, arr, mask, jax.random.PRNGKey(0))
        )[0].tolist()
        assert results[i] == want, (
            f"stream {i}: {results[i]} != {want}"
        )
    assert stats["total_tokens"] == sum(limits)
    assert stats["p50_latency_s"] > 0


def test_compaction_parity(rng):
    """Unbounded serving (ROADMAP #6): a cache too small for the total
    decode-step budget forces ≥1 compaction (re-prefill of live
    histories); greedy outputs must be IDENTICAL to a run with ample
    cache, and the ample run must not compact."""
    params = init_decoder_params(_tiny_config())
    n = 8
    prompts = [
        rng.integers(5, 250, size=int(rng.integers(4, 16))).tolist()
        for _ in range(n)
    ]
    limits = [int(rng.integers(8, 16)) for _ in range(n)]
    # total decode steps ≈ sum(limits) / n_slots · slack; cursor starts
    # at 16: max_position 64 forces compaction well before the queue
    # drains, 512 never does
    small = DecoderConfig(**{
        **_tiny_config().__dict__, "max_position": 64
    })
    gen_small = ContinuousGenerator(small, params, n_slots=2, seg_len=4)
    got, stats_small = gen_small.generate_many(prompts, limits)
    gen_big = ContinuousGenerator(_tiny_config(), params, n_slots=2, seg_len=4)
    want, stats_big = gen_big.generate_many(prompts, limits)
    assert stats_small["compactions"] >= 1
    assert stats_big["compactions"] == 0
    assert got == want


def test_continuous_respects_eos(rng):
    """Streams that hit EOS free their slot early and later refills are
    unaffected by the previous tenant's cache."""
    config = _tiny_config()
    params = init_decoder_params(config)
    prompts = [rng.integers(5, 250, size=6).tolist() for _ in range(6)]
    # pick an eos id that the greedy model actually emits somewhere:
    # run one stream statically and use its 2nd token as eos
    fn = make_generate_fn(config, max_new_tokens=4, temperature=0.0)
    arr = np.zeros((1, 8), np.int32)
    mask = np.zeros((1, 8), np.int32)
    arr[0, 2:] = prompts[0]
    mask[0, 2:] = 1
    toks = np.asarray(fn(params, arr, mask, jax.random.PRNGKey(0)))[0]
    eos = int(toks[1])

    gen = ContinuousGenerator(config, params, n_slots=2, seg_len=3,
                              eos_id=eos)
    results, stats = gen.generate_many(prompts, 8)
    assert len(results) == 6
    for r in results:
        assert len(r) <= 8
        assert eos not in r
