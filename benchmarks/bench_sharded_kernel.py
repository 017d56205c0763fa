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

    def stream(fn, *arrs):
        # corpus planes are jit ARGUMENTS, not closures: a captured
        # multi-GB constant gets embedded in the executable and breaks
        # the tunnel's remote_compile (CLAUDE.md environment gotchas)
        @jax.jit
        def run(qall, *arrs):
            def step(_, q):
                return None, fn(q, *arrs)

            _, out = jax.lax.scan(step, None, qall)
            return out

        return lambda b: run(b, *arrs)

    configs = {
        "bf16_direct": (
            lambda q, c: flat_topk_pallas(
                q, c, K, group_l=32, valid_n=n_valid,
                precise=True, tail="fold", interpret=interpret,
            ),
            (corpus_bf16,),
        ),
        "bf16_sharded": (
            lambda q, c: sharded_flat_topk(
                q, c, K, mesh, valid_n=n_valid, kernel="pallas",
                group_l=32, tail="fold", interpret=interpret,
            ),
            (sh_bf16,),
        ),
        "int8r_direct": (
            lambda q, a, r, s: flat_topk_pallas_int8(
                q, a, s, K, corpus_res=r, group_l=32, valid_n=n_valid,
                tail="fold", interpret=interpret,
            ),
            (q1, q2, s8),
        ),
        "int8r_sharded": (
            lambda q, a, r, s: sharded_flat_topk_int8(
                q, a, s, K, mesh, res=r, valid_n=n_valid,
                group_l=32, tail="fold", interpret=interpret,
            ),
            (sh_q1, sh_q2, sh_s8),
        ),
    }
    qps = {}
    for name, (fn, arrs) in configs.items():
        run = stream(fn, *arrs)
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
