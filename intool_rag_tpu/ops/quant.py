"""Int8 quantization for the dense index.

Flat search is HBM-bandwidth bound (BASELINE.md north star); int8 halves
the corpus bytes vs bf16 and the MXU multiplies int8 natively
(int8×int8→int32). Scheme: symmetric per-row absmax scaling for both
corpus and queries; score = int32_dot · (q_scale · c_scale), which
preserves cosine ranking to ~1e-2 relative error.

A Pallas stochastic-rounding quantizer is provided for on-device
(re)quantization during streaming ingest; the XLA path quantizes with
round-to-nearest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import merge_topk


def quantize_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric absmax quantization.
    Returns (values int8 [N, D], scales f32 [N])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)
    scale = jnp.maximum(absmax, 1e-9) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[:, None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_int8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[:, None]


def quantize_int8_residual(
    x: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Two-level int8 row encoding: ``row ≈ scale · (q1 + q2/128)``.

    ``q1`` is the per-row absmax int8 code (same grid as
    :func:`quantize_int8`); ``q2 = round(128·(row/scale − q1))`` is the
    rounding residual on the FIXED scale/128 grid — |residual| ≤ 0.5 by
    construction, so 128·residual ∈ [−64, 64] fits int8 exactly. Two
    int8 planes give ~15-bit effective corpus precision (better than
    bf16's 8-bit mantissa) at bf16's total byte cost, while both matmuls
    run at the MXU's 2× int8 MAC rate (ops/flat_pallas.py
    ``corpus_res=``). Returns ``(q1 int8 [N,D], q2 int8 [N,D],
    scale f32 [N])``.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1)
    scale = jnp.maximum(absmax, 1e-9) / 127.0
    scaled = xf / scale[:, None]
    q1f = jnp.round(jnp.clip(scaled, -127.0, 127.0))
    q2 = jnp.round(128.0 * (scaled - q1f)).astype(jnp.int8)
    return q1f.astype(jnp.int8), q2, scale


# ---------------- Pallas stochastic-rounding quantizer ----------------


def _quant_kernel(x_ref, seed_ref, q_ref, scale_ref):
    pltpu.prng_seed(seed_ref[0])
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-9) / 127.0
    scaled = jnp.clip(x / scale, -127.0, 127.0)
    # int8 stochastic rounding by hand (pltpu.stochastic_round only
    # targets float dtypes): floor(x + u), u ~ U[0,1) from the top 24
    # random bits — unbiased for any x.
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # Mosaic can't cast uint32→f32 directly; the top 24 bits fit in a
    # non-negative int32, which casts fine.
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    q = jnp.clip(jnp.floor(scaled + u), -127.0, 127.0)
    q_ref[:] = q.astype(jnp.int8)
    scale_ref[:] = scale


def quantize_int8_stochastic(
    x: jax.Array, seed: int = 0, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """On-device quantizer with stochastic rounding (unbiased under
    repeated requantization — streaming ingest path). Pallas kernel on
    TPU; XLA uniform-dither fallback elsewhere (pltpu.prng_* has no CPU
    lowering, even interpreted)."""
    n, d = x.shape
    if jax.default_backend() != "tpu":
        key = jax.random.PRNGKey(seed)
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-9) / 127.0
        scaled = jnp.clip(xf / scale, -127.0, 127.0)
        dither = jax.random.uniform(key, scaled.shape, minval=-0.5, maxval=0.5)
        q = jnp.clip(jnp.round(scaled + dither), -127, 127).astype(jnp.int8)
        return q, scale[:, 0]
    q, scale = pl.pallas_call(
        _quant_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(x, jnp.array([seed], jnp.int32))
    return q, scale[:, 0]


# ---------------- int8 flat search ----------------


@functools.partial(
    jax.jit, static_argnames=("k", "block_n", "valid_n", "use_approx")
)
def flat_topk_int8(
    queries: jax.Array,  # [Q, D] f32
    corpus_q: jax.Array,  # [N, D] int8
    corpus_scale: jax.Array,  # [N] f32
    k: int,
    *,
    block_n: int = 16384,
    valid_n: int | None = None,
    use_approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Blockwise int8 MIPS top-k: int8×int8→int32 on the MXU, rescaled to
    f32 scores. Returns (scores [Q, k], rows [Q, k])."""
    n, d = corpus_q.shape
    q = queries.shape[0]
    if valid_n is None:
        valid_n = n
    k = min(k, n)
    q_int, q_scale = quantize_int8(queries)

    block_n = min(block_n, n)
    num_blocks = -(-n // block_n)
    padded = num_blocks * block_n
    if padded != n:
        corpus_q = jnp.pad(corpus_q, ((0, padded - n), (0, 0)))
        corpus_scale = jnp.pad(corpus_scale, (0, padded - n))

    def body(carry, block_idx):
        best_vals, best_rows = carry
        start = block_idx * block_n
        block = jax.lax.dynamic_slice(corpus_q, (start, 0), (block_n, d))
        bscale = jax.lax.dynamic_slice(corpus_scale, (start,), (block_n,))
        acc = jax.lax.dot_general(
            q_int,
            block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = acc.astype(jnp.float32) * q_scale[:, None] * bscale[None, :]
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (q, block_n), 1)
        scores = jnp.where(ids < valid_n, scores, -jnp.inf)
        if use_approx:
            bvals, bpos = jax.lax.approx_max_k(scores, min(k, block_n))
        else:
            bvals, bpos = jax.lax.top_k(scores, min(k, block_n))
        brows = jnp.take_along_axis(ids, bpos, axis=-1)
        return merge_topk(best_vals, best_rows, bvals, brows, k), None

    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    return vals, rows
