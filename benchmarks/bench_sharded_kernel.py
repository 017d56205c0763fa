"""Per-shard throughput of the sharded search path (round-3 verdict
item 2: the sharded tier must serve with the real kernels).

On real multi-chip hardware each shard runs its local selection
independently and the k-candidate merge is negligible (k·n_shards
values over ICI), so PER-SHARD throughput ≈ what one chip sustains
through ``shard_map``. This bench builds a 1-device mesh on the real
TPU and times the sharded path (shard_map + fused Pallas kernel +
merge) against the bare single-chip kernel at the same 1M×d1024
operating point — the difference IS the sharding overhead. Covers the
bf16 precise kernel and the int8-residual capacity tier (the headline
dense config), demonstrating capacity tiers × sharding composition at
full speed.
"""

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import device_corpus, device_queries, emit, timed_min

D, Q, G, K = 1024, 256, 4, 100
N_PAD = 1_007_616  # 123·8192 — block-aligned for group_l ≤ 64
N_VALID = 1_000_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = ensure_backend()
    from intool_rag_tpu.ops.flat_pallas import (
        flat_topk_pallas,
        flat_topk_pallas_int8,
    )
    from intool_rag_tpu.ops.quant import quantize_int8_residual
    from intool_rag_tpu.parallel.mesh import corpus_mesh
    from intool_rag_tpu.parallel.sharded_search import (
        shard_corpus,
        sharded_flat_topk,
        sharded_flat_topk_int8,
    )

    if backend != "tpu":
        n_pad, n_valid = 98_304, 96_000
    else:
        n_pad, n_valid = N_PAD, N_VALID
    interpret = backend != "tpu"
    mesh = corpus_mesh(jax.devices()[:1])
    corpus_f32 = device_corpus(n_pad, D, dtype="float32")
    corpus_bf16 = corpus_f32.astype(jnp.bfloat16)
    q1, q2, s8 = jax.jit(quantize_int8_residual)(corpus_f32)
    sh_bf16 = shard_corpus(corpus_bf16, mesh)
    sh_q1 = shard_corpus(q1, mesh)
    sh_q2 = shard_corpus(q2, mesh)
    sh_s8 = shard_corpus(s8, mesh)
    batches = device_queries(G, Q, D)

    def stream(fn):
        @jax.jit
        def run(qall):
            def step(_, q):
                return None, fn(q)

            _, out = jax.lax.scan(step, None, qall)
            return out

        return run

    configs = {
        "bf16_direct": lambda q: flat_topk_pallas(
            q, corpus_bf16, K, group_l=32, valid_n=n_valid,
            precise=True, tail="fold", interpret=interpret,
        ),
        "bf16_sharded": lambda q: sharded_flat_topk(
            q, sh_bf16, K, mesh, valid_n=n_valid, kernel="pallas",
            group_l=32, tail="fold", interpret=interpret,
        ),
        "int8r_direct": lambda q: flat_topk_pallas_int8(
            q, q1, s8, K, corpus_res=q2, group_l=32, valid_n=n_valid,
            tail="fold", interpret=interpret,
        ),
        "int8r_sharded": lambda q: sharded_flat_topk_int8(
            q, sh_q1, sh_s8, K, mesh, res=sh_q2, valid_n=n_valid,
            group_l=32, tail="fold", interpret=interpret,
        ),
    }
    qps = {}
    for name, fn in configs.items():
        run = stream(fn)
        dt = timed_min(lambda b: run(b), batches) / G
        qps[name] = Q / dt
        emit(
            f"sharded_kernel_{name}",
            qps[name], "queries/s", backend=backend,
            n=n_valid, d=D, batch=Q, k=K,
        )
    for kind in ("bf16", "int8r"):
        emit(
            f"sharded_kernel_{kind}_overhead",
            100.0 * (1.0 - qps[f"{kind}_sharded"] / qps[f"{kind}_direct"]),
            "percent", backend=backend,
        )


if __name__ == "__main__":
    main()
