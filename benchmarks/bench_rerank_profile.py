"""Reranker limiter profile (round-3 verdict item 8 / SURVEY §7.3 #7).

The round-2 target was rerank-100→10 p50 ≤ 300 ms; round 3 landed at
346 ms after bf16 pre-cast + pipelined bucket dispatch, with "head-dim
layout" as the HYPOTHESIZED remaining limiter. The axon tunnel does not
expose device trace capture, so this profiles by construction instead:
config A/Bs that hold FLOPs constant while moving one layout variable,
plus an MFU decomposition of the measured step.

A/Bs at the serving operating point (64-pair buckets × 192 tokens,
bge-reranker-v2-m3 dims 24L/1024h):

1. heads 16×64 (the XLM-R layout) vs 8×128 — same FLOPs, head_dim
   spans a full 128-lane register in the second config; if Mosaic/XLA
   attention is lane-padding the 64-wide head_dim, (2) wins.
2. flash attention off (XLA fused) vs forced on at seq 192 — the flash
   kernel's block shapes are tuned for long sequences; short sequences
   may pay its overheads.
3. seq 192 vs 256 vs 128 — padding-waste sensitivity around the bucket
   snap.

Emits one JSON line per config with ms/bucket and MFU vs the 197
bf16-TFLOP/s v5e peak.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_rerank_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from intool_rag_tpu.backend import ensure_backend

from common import emit  # noqa: E402

B = 64  # serving bucket
PEAK = 197e12  # v5e bf16 FLOP/s


def encoder_flops(cfg, b, s) -> float:
    """Forward FLOPs of the XLM-R body (matmuls only)."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    per_layer = (
        4 * 2 * b * s * h * h  # q,k,v,out projections
        + 2 * 2 * b * s * s * h  # qk^T and av
        + 2 * 2 * b * s * h * i  # mlp in/out
    )
    return L * per_layer


def main() -> None:
    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.models.encoder import EncoderConfig
    from intool_rag_tpu.models.reranker import CrossEncoder

    on_tpu = backend == "tpu"
    base = dict(
        vocab_size=250_002 if on_tpu else 1024,
        hidden_size=1024 if on_tpu else 64,
        num_layers=24 if on_tpu else 2,
        intermediate_size=4096 if on_tpu else 128,
        max_position=8194 if on_tpu else 520,
        dtype="bfloat16",
    )
    nh = 16 if on_tpu else 4

    configs = [
        ("heads16x64_s192_xla", dict(base, num_heads=nh, flash_min_len=0), 192),
        ("heads8x128_s192_xla", dict(base, num_heads=nh // 2, flash_min_len=0), 192),
        ("heads16x64_s192_flash", dict(base, num_heads=nh, flash_min_len=64), 192),
        ("heads16x64_s128_xla", dict(base, num_heads=nh, flash_min_len=0), 128),
        ("heads16x64_s256_xla", dict(base, num_heads=nh, flash_min_len=0), 256),
    ]
    rng = np.random.default_rng(0)
    for name, kw, seq in configs:
        cfg = EncoderConfig(**kw)
        model = CrossEncoder(cfg)
        ids0 = jnp.asarray(
            rng.integers(4, min(cfg.vocab_size, 30_000), (B, seq)).astype(np.int32)
        )
        mask = jnp.ones((B, seq), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids0[:1], mask[:1])
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2
            else x,
            params,
        )
        fwd = jax.jit(model.apply)
        try:
            np.asarray(fwd(params, ids0, mask))  # compile
            idss = [
                jnp.asarray(
                    rng.integers(4, min(cfg.vocab_size, 30_000), (B, seq)).astype(np.int32)
                )
                for _ in range(4)
            ]
            times = []
            for ids in idss:
                t0 = time.perf_counter()
                np.asarray(fwd(params, ids, mask))
                times.append(time.perf_counter() - t0)
            dt = min(times)
        except Exception as exc:
            emit(f"rerank_prof_{name}", 0.0, "ms", backend=backend,
                 error=str(exc)[:160])
            continue
        flops = encoder_flops(cfg, B, seq)
        emit(
            f"rerank_prof_{name}", dt * 1e3, "ms/bucket", backend=backend,
            mfu=round(flops / dt / PEAK, 4), seq=seq,
            pairs_per_s=round(B / dt, 1),
        )


if __name__ == "__main__":
    main()
