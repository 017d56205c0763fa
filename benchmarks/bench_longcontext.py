"""Long-context encoder benchmark (SURVEY §5.7: BGE-M3's 8192-token
inputs): tokens/s and per-sequence latency at 512/2048/8192 tokens for
the full BGE-M3-sized encoder (hidden 1024, 24 layers — FLOPs are
weight-independent, so random init measures real throughput), plus a
flash-vs-XLA attention parity check at 1024 tokens.

Round-1 gap: nothing exercised inputs beyond ~516 tokens. The 8192-token
path uses the Pallas flash-attention kernel (models/encoder.py
flash_min_len) — XLA attention would materialize [S,S] scores per head.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main() -> None:
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.models.encoder import (
        EncoderConfig,
        encode_fn,
        init_params,
    )

    out: dict = {"backend": backend, "model": "bge-m3-size (random init)"}

    # ---- parity: flash vs XLA attention at 1024 tokens (small config) ----
    if backend == "tpu":
        cfg_small = EncoderConfig(
            vocab_size=4096, hidden_size=256, num_layers=2, num_heads=4,
            intermediate_size=512, max_position=1026, dtype="float32",
            flash_min_len=1024,
        )
        cfg_noflash = dataclasses.replace(cfg_small, flash_min_len=0)
        params = init_params(cfg_small)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(4, 4096, (2, 1024)).astype(np.int32))
        m = np.ones((2, 1024), np.int32)
        m[1, 700:] = 0  # padding in one row
        m = jnp.asarray(m)
        e_flash = np.asarray(jax.jit(encode_fn(cfg_small))(params, ids, m))
        e_xla = np.asarray(jax.jit(encode_fn(cfg_noflash))(params, ids, m))
        cos = float(
            (e_flash * e_xla).sum(-1).mean()
            / (np.linalg.norm(e_flash, axis=-1) * np.linalg.norm(e_xla, axis=-1)).mean()
        )
        out["flash_vs_xla_cosine@1024"] = round(cos, 6)

    # ---- throughput: full-size encoder ----
    cfg = EncoderConfig(dtype="bfloat16")  # bge-m3 dims
    params = init_params(cfg)
    out["seq"] = {}
    for seq, batch in ((512, 8), (2048, 4), (8192, 1)):
        fn = jax.jit(encode_fn(cfg))
        rng = np.random.default_rng(seq)
        variants = [
            (
                jnp.asarray(rng.integers(4, 250_000, (batch, seq)).astype(np.int32)),
                jnp.asarray(np.ones((batch, seq), np.int32)),
            )
            for _ in range(4)
        ]
        try:
            np.asarray(fn(params, *variants[-1]))  # compile
            times = []
            for ids, m in variants[:3]:
                t0 = time.perf_counter()
                np.asarray(fn(params, ids, m))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            out["seq"][seq] = {
                "batch": batch,
                "tokens_per_s": round(batch * seq / dt, 1),
                "ms_per_seq": round(dt / batch * 1000, 2),
            }
        except Exception as exc:  # OOM / lowering failure — record it
            out["seq"][seq] = {"error": f"{type(exc).__name__}: {str(exc)[:200]}"}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
