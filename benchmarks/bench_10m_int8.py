"""Config #5 (corpus scale) on a single chip: 10M chunks × d1024 as an
int8-quantized resident index (10.24GB HBM), batched 256-query search.

Notes that made this fit/work on v5e (≈12GB usable HBM):
- int8 per-row quantization (quantize_int8) halves bf16 / quarters f32;
- the corpus assembles with donated dynamic_update_slice calls — without
  donation each update allocates a fresh 10GB buffer and fragments HBM
  into ResourceExhausted;
- approx_max_k per block (recall≈1.0 at k≤10) avoids the sort bottleneck.

Multi-chip sharding (parallel/sharded_search.py) extends beyond this;
see tests/test_sharded_scale.py for the mesh path.
"""

import functools
import time

import numpy as np

from intool_rag_tpu.backend import ensure_backend

from common import emit

D, Q, SHARD = 1024, 256, 500_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from intool_rag_tpu.ops.quant import flat_topk_int8, quantize_int8

    backend = ensure_backend()
    n = 10_000_000 if backend == "tpu" else 200_000
    shard = min(SHARD, n)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def add_shard(buf_q, buf_s, key, start):
        c = jax.random.normal(key, (shard, D), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        q, s = quantize_int8(c)
        return (
            jax.lax.dynamic_update_slice(buf_q, q, (start, 0)),
            jax.lax.dynamic_update_slice(buf_s, s, (start,)),
        )

    cq = jnp.zeros((n, D), jnp.int8)
    cs = jnp.zeros((n,), jnp.float32)
    for i in range(n // shard):
        cq, cs = add_shard(cq, cs, jax.random.PRNGKey(i), jnp.int32(i * shard))
    cq.block_until_ready()

    make_q = jax.jit(lambda k: jax.random.normal(k, (Q, D), jnp.float32))
    qs = [make_q(jax.random.PRNGKey(100 + i)) for i in range(4)]
    block = min(125_000, n)
    np.asarray(flat_topk_int8(qs[-1], cq, cs, 100, block_n=block, use_approx=True)[0])
    times = []
    for q in qs[:3]:
        t0 = time.perf_counter()
        np.asarray(flat_topk_int8(q, cq, cs, 100, block_n=block, use_approx=True)[0])
        times.append(time.perf_counter() - t0)
    qps = Q / min(times)

    _, ra = flat_topk_int8(qs[0][:16], cq, cs, 10, block_n=block, use_approx=True)
    _, re_ = flat_topk_int8(qs[0][:16], cq, cs, 10, block_n=block)
    ex = [set(x.tolist()) for x in np.asarray(re_)]
    rec = sum(len(ex[i] & set(x.tolist())) for i, x in enumerate(np.asarray(ra))) / 160
    emit(
        f"dense_int8_qps_{n//1_000_000}M_single_chip", qps, "queries/s",
        backend=backend, hbm_gb=round(cq.nbytes / 1e9, 2),
        recall10_vs_exact_int8=round(rec, 4),
    )


if __name__ == "__main__":
    main()
