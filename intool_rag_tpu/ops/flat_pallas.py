"""Pallas fused score + partial-top-k kernel (the flat-search hot path).

Replaces the FAISS C++ search the reference delegates to
(rag/storage/faiss_index.py:83) with a single-pass TPU kernel:

    for each corpus block b (grid):
        S = Q @ Eb^T                      # MXU, bf16 in / f32 accumulate
        for each lane-group g of width L:
            out_vals[:, b, g] = max(S[:, gL:(g+1)L])   # VPU cross-lane max
            out_idx [:, b, g] = argmax + global offset

followed by one small exact ``lax.top_k`` over the ``[Q, N/L]``
candidates. This is the partial-reduce ("approx top-k") scheme of the
TPU-KNN approach: one corpus read from HBM, no ``[Q, N]`` score
materialization, matmul at MXU speed with an O(N/L) tail. Expected
recall@k ≈ prod_{i<k}(1 - i·L/N) ≈ 1 - k²L/(2N); choose L accordingly
(L=128 at N=1M gives ~0.999 for k=10; shrink L for small corpora —
callers use :func:`choose_group_width`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def choose_group_width(n: int, k: int, target_recall: float = 0.98) -> int:
    """Largest power-of-two lane-group width L (≤128) with expected
    recall ≥ target. A rank-i item is lost iff a better item shares its
    group (prob ≈ i·L/N), so expected recall ≈ 1 - k·L/(2N)."""
    l = 128
    while l > 8 and 1.0 - (k * l) / (2.0 * max(n, 1)) < target_recall:
        l //= 2
    return l


def _reduce_block(
    scores, valid_n, *, base, block_n, group_l, argmax_mode, vals_ref, idx_ref
):
    """Grouped partial-max reduce of a scored block, with boundary
    masking only on the block that straddles valid_n (shared by the
    bf16 and int8 kernels)."""
    q = scores.shape[0]
    lw = block_n // group_l  # lane width: 128 on the real path

    def reduce_and_store(scores):
        # Grouped partial reduce, fully vectorized: split the block's
        # columns as [group_l, 128] with lanes preserved (col = j·128 +
        # lane — a free relayout), then one cross-sublane max per block
        # instead of a Python loop of narrow [Q, L] maxes (which used
        # 16/128 lanes and made the kernel VPU-bound; round-1 verdict
        # item 7). Group membership is strided ({lane + 128·j}) — recall
        # math is identical for unordered corpora.
        scores3 = scores.reshape(q, group_l, lw)
        gmax = jnp.max(scores3, axis=1)  # [Q, lw]
        if argmax_mode == "argmax":
            # A/B lever (roofline analysis (b)): one reduction for the
            # index instead of eq-mask + masked-min (3 passes → 2) —
            # whether Mosaic lowers sublane argmax efficiently is a
            # hardware question; bench_flat_tune sweeps both. Same
            # first-occurrence tie semantics.
            garg = jnp.argmax(scores3, axis=1).astype(jnp.int32)
        else:
            # first-argmax over the sublane axis via masked min of row
            # indices
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (q, group_l, lw), 1)
            is_max = scores3 == gmax[:, None, :]
            garg = jnp.min(jnp.where(is_max, j_iota, group_l), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (q, lw), 1)
        vals_ref[:, :] = gmax
        idx_ref[:, :] = base + garg * lw + lane

    # Per-element validity masking costs 2 VPU passes over every score;
    # only the block overlapping the valid/padding boundary needs it —
    # interior blocks take the unmasked path (pl.when selects per block).
    @pl.when(base + block_n <= valid_n)
    def _interior():
        reduce_and_store(scores)

    @pl.when(base + block_n > valid_n)
    def _boundary():
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (q, block_n), 1)
        reduce_and_store(
            jnp.where(base + col_ids < valid_n, scores, -jnp.inf)
        )


def _partial_topk_kernel(
    valid_ref, q_ref, qlo_ref, c_ref, vals_ref, idx_ref, *, block_n, group_l,
    argmax_mode="maskmin",
):
    bi = pl.program_id(0)
    valid_n = valid_ref[0]  # SMEM scalar: no recompile per corpus append
    # HIGHEST precision only makes sense for f32 operands (avoids the bf16
    # 3-pass default); Mosaic rejects fp32 contract precision on bf16 inputs.
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [Q, block_n]
    if qlo_ref is not None:
        # split-query compensation pass: q ≈ q_hi + q_lo in bf16 pairs,
        # so q·c matches the f32-query × bf16-corpus product to ~2^-16
        # relative — the final ranking no longer needs a separate exact
        # rescore of the candidate pool (round-3: the rescore gather was
        # 5.9 ms/batch, ~⅓ of the dense stage)
        scores += jax.lax.dot_general(
            qlo_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    _reduce_block(
        scores, valid_n, base=bi * block_n, block_n=block_n,
        group_l=group_l, argmax_mode=argmax_mode,
        vals_ref=vals_ref, idx_ref=idx_ref,
    )


def _partial_topk_kernel_int8(
    valid_ref, q1_ref, q2_ref, c_ref, c2_ref, cs_ref, vals_ref, idx_ref, *,
    block_n, group_l, argmax_mode="maskmin",
):
    """int8 variant: int8×int8→int32 on the MXU (2× bf16 MACs/cycle on
    v5e) over an int8 corpus (half the HBM bytes of bf16). Per-row
    corpus scales are applied before the grouped reduce (they vary per
    column); the per-QUERY scale is constant within a row, so it is
    applied outside the kernel after the tail. ``q2`` is the optional
    split-query compensation pass at the FIXED ratio s2 = s1/128
    (q2 = round(128·(q/s1 − q1)) ∈ [−64, 64]), giving ~15-bit effective
    query precision with a constant 1/128 fold — no per-row scale
    plumbing into the kernel. ``c2`` is the optional CORPUS residual
    plane on the same fixed 1/128 grid (ops/quant.py
    ``quantize_int8_residual``): a third int8 matmul ``q1·c2/128``
    lifts corpus precision to ~15 bits — above bf16's 8-bit mantissa —
    so in-kernel ranking beats the bf16 kernel's while every pass stays
    at the int8 MAC rate. The q2·c2 cross term (~2⁻¹⁴ relative) is
    deliberately dropped."""
    bi = pl.program_id(0)
    valid_n = valid_ref[0]
    acc = jax.lax.dot_general(
        q1_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Q, block_n] i32
    scores = acc.astype(jnp.float32)
    if q2_ref is not None:
        acc2 = jax.lax.dot_general(
            q2_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores += acc2.astype(jnp.float32) * (1.0 / 128.0)
    if c2_ref is not None:
        acc3 = jax.lax.dot_general(
            q1_ref[:],
            c2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores += acc3.astype(jnp.float32) * (1.0 / 128.0)
    scores = scores * cs_ref[:]  # [1, block_n] broadcast over query rows
    _reduce_block(
        scores, valid_n, base=bi * block_n, block_n=block_n,
        group_l=group_l, argmax_mode=argmax_mode,
        vals_ref=vals_ref, idx_ref=idx_ref,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "group_l", "interpret", "tail", "precise",
        "argmax_mode", "tail_rt",
    ),
)
def flat_topk_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    block_n: int | None = None,
    group_l: int = 16,
    valid_n: int | jax.Array | None = None,
    interpret: bool = False,
    tail: str = "approx",
    precise: bool = False,
    argmax_mode: str = "maskmin",
    tail_rt: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat MIPS top-k. ``corpus [N, D]`` must have N a multiple of
    ``block_n`` and D a multiple of 128 (the index build pads to this).

    Shape constraints (measured on v5e): each grid step's output slice
    ``[Q, block_n/group_l]`` needs a last dimension divisible by 128, so
    ``block_n = 128·group_l``; and the corpus input block
    ``[block_n, D]`` must fit double-buffered VMEM, which caps
    ``block_n ≤ 2048`` at D=1024 — hence ``group_l ≤ 16`` for large-D
    corpora. Returns ``(scores [Q, k] f32, indices [Q, k] i32)``.
    """
    n, d = corpus.shape
    if block_n is None:
        block_n = 128 * group_l
    if block_n % (128 * group_l) != 0 and not interpret:
        raise ValueError(
            f"block_n={block_n} must be a multiple of 128·group_l={128 * group_l} "
            "(Mosaic output-tile constraint)"
        )
    if n % block_n != 0 or d % 128 != 0:
        raise ValueError(f"corpus shape {corpus.shape} not padded to ({block_n}, 128)")
    if valid_n is None:
        valid_n = n
    q = queries.shape[0]
    q_pad = _round_up(max(q, 8), 8)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    precise = precise and corpus.dtype == jnp.bfloat16
    if precise:
        qf = queries.astype(jnp.float32)
        q_hi = qf.astype(jnp.bfloat16)
        q_lo = (qf - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        queries = q_hi
    else:
        queries = queries.astype(corpus.dtype)
        q_lo = None

    num_blocks = n // block_n
    num_groups = block_n // group_l

    q_spec = pl.BlockSpec(
        (q_pad, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [q_spec]
    if precise:
        in_specs.append(q_spec)
    in_specs.append(
        pl.BlockSpec((block_n, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q_pad, num_groups), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, num_groups), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ],
    )

    if precise:
        kernel = functools.partial(
            _partial_topk_kernel, block_n=block_n, group_l=group_l,
            argmax_mode=argmax_mode,
        )
        operands = (valid_arr := jnp.asarray([valid_n], jnp.int32), queries, q_lo, corpus)
    else:
        def kernel(valid_ref, q_ref, c_ref, vals_ref, idx_ref):
            _partial_topk_kernel(
                valid_ref, q_ref, None, c_ref, vals_ref, idx_ref,
                block_n=block_n, group_l=group_l, argmax_mode=argmax_mode,
            )

        operands = (valid_arr := jnp.asarray([valid_n], jnp.int32), queries, corpus)
    compiler_params = None
    if not interpret:
        # the split-query second matmul's accumulator exceeds the 16 MB
        # default scoped-VMEM budget at block_n 2048 / D 1024 (measured
        # 17.65 MB); v5e has 128 MB VMEM — raise the cap, scaled to the
        # block so block_n 8192 (double-buffered 16 MB corpus blocks +
        # f32 scores) also compiles
        need = (
            2 * block_n * d * corpus.dtype.itemsize  # double-buffered block
            + (2 if precise else 1) * q_pad * d * 2  # query (+lo) bf16
            # f32 score accumulator (+ the split-query compensation
            # matmul's own accumulator before the add, measured at b8192:
            # 65.65 MB actual vs 57 MB modeled without it)
            + (2 if precise else 1) * q_pad * block_n * 4
            + 2 * q_pad * (block_n // group_l) * 8  # out tiles (vals+idx)
        )
        cap = max(48, min(110, need // (1024 * 1024) + 20))
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(cap) * 1024 * 1024
        )
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, num_blocks * num_groups), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, num_blocks * num_groups), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 if precise else 2) * q_pad * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + q_pad * d * 4,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)

    return _candidates_topk(cand_vals, cand_idx, k, q, tail=tail, tail_rt=tail_rt)


def _candidates_topk(cand_vals, cand_idx, k, q, *, tail, tail_rt):
    """Top-k tail over the [Q, N/L] partial-max candidate arrays (shared
    by the bf16 and int8 kernels)."""
    # barrier: without it XLA tries to keep the full [Q, N/L] candidate
    # arrays in scoped VMEM for the downstream top-k and OOMs at 1M rows
    cand_vals, cand_idx = jax.lax.optimization_barrier((cand_vals, cand_idx))
    k_eff = min(k, cand_vals.shape[1])
    if tail == "two" and cand_vals.shape[1] >= 8 * k_eff:
        # two-stage tail: a loose approx pass casts a 4·k-wide net
        # (recall_target below the 0.999 that degenerates to a near-full
        # sort — measured 5.76 ms vs 2.86 ms at rt 0.95 on [256, 31k]),
        # then an exact top-k of the net recovers the precise pool.
        net_vals, net_pos = jax.lax.approx_max_k(
            cand_vals, min(4 * k_eff, cand_vals.shape[1]),
            recall_target=tail_rt,
        )
        top_vals, top_pos2 = jax.lax.top_k(net_vals, k_eff)
        top_pos = jnp.take_along_axis(net_pos, top_pos2, axis=-1)
    elif tail == "fold" and cand_vals.shape[1] >= 8 * k_eff:
        # fold-by-2 partial reduce (one VPU pass over the candidate
        # array, bandwidth-bound) halves the array the tight approx pass
        # must sort; recall cost is one more random-collision layer
        # (≈ doubling the effective group width for sub-k stragglers)
        half = cand_vals.shape[1] // 2
        a, b = cand_vals[:, :half], cand_vals[:, half : 2 * half]
        take_a = a >= b
        fold_vals = jnp.where(take_a, a, b)
        fold_idx = jnp.where(take_a, cand_idx[:, :half], cand_idx[:, half : 2 * half])
        top_vals, top_pos = jax.lax.approx_max_k(
            fold_vals, k_eff, recall_target=0.999
        )
        top_idx = jnp.take_along_axis(fold_idx, top_pos, axis=-1)
        return top_vals[:q], top_idx[:q]
    elif tail == "approx" and cand_vals.shape[1] >= 4 * k_eff:
        # approx_max_k over the candidate array: adjacent candidates come
        # from different corpus blocks (position = block·lw + lane), so
        # the per-group partial reduce loses only random stragglers.
        # recall_target 0.999: at 0.95 the hybrid pipeline's end-to-end
        # recall@10 vs the exact-hybrid oracle measured 0.9625 (missing
        # tail-of-100 dense candidates shift the fusion cut); 0.999
        # restores ≥0.99 and the tail still beats the exact blocked sort.
        top_vals, top_pos = jax.lax.approx_max_k(
            cand_vals, k_eff, recall_target=0.999
        )
    else:
        from .topk import blocked_topk

        top_vals, top_pos = blocked_topk(cand_vals, k_eff, block=1024)
    top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=-1)
    return top_vals[:q], top_idx[:q]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "group_l", "interpret", "tail", "precise",
        "argmax_mode", "tail_rt",
    ),
)
def flat_topk_pallas_int8(
    queries: jax.Array,
    corpus_q: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    *,
    corpus_res: jax.Array | None = None,
    block_n: int | None = None,
    group_l: int = 32,
    valid_n: int | jax.Array | None = None,
    interpret: bool = False,
    tail: str = "fold",
    precise: bool = True,
    argmax_mode: str = "maskmin",
    tail_rt: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat MIPS top-k over an int8 corpus (``corpus_q [N, D]
    int8`` + per-row ``corpus_scale [N] f32`` from
    :func:`intool_rag_tpu.ops.quant.quantize_int8`).

    vs the bf16 kernel: half the HBM corpus bytes AND the MXU runs int8
    at 2× the bf16 MAC rate on v5e, so the matmul-bound kernel body
    (BENCH_NOTES round-3c roofline) drops ~2× even with the split-query
    compensation matmul (``precise=True``, ~15-bit query precision at a
    fixed s1/128 ratio — see ``_partial_topk_kernel_int8``). Corpus
    precision is int8 absmax (~2⁻⁸ relative) vs bf16's 2⁻⁹ — the recall
    cost is measured in bench.py's exact-hybrid oracle check.

    ``corpus_res`` (from ``quantize_int8_residual``) adds the corpus
    residual plane: one more int8 matmul per block lifts corpus
    precision to ~15 bits (beats bf16) at bf16's total HBM bytes and
    ~0.75× its MXU time — the recall-loss-free int8 configuration
    (DENSE_PATH=int8r / DENSE_INT8_RESIDUAL). Measured decomposition
    rationale: the plain-int8 pool holds the true top-10 as well as
    bf16's (0.9988 at 1M); only in-pool ranking noise costs recall, and
    a post-hoc exact rescore needs ~8 ms/batch of row gathers — the
    in-kernel residual pass buys the same precision from data already
    streaming through VMEM.

    Returns ``(scores [Q, k] f32, indices [Q, k] i32)``.
    """
    n, d = corpus_q.shape
    if corpus_q.dtype != jnp.int8:
        raise ValueError(f"corpus must be int8, got {corpus_q.dtype}")
    if block_n is None:
        block_n = 128 * group_l
    if block_n % (128 * group_l) != 0 and not interpret:
        raise ValueError(
            f"block_n={block_n} must be a multiple of 128·group_l={128 * group_l} "
            "(Mosaic output-tile constraint)"
        )
    if n % block_n != 0 or d % 128 != 0:
        raise ValueError(f"corpus shape {corpus_q.shape} not padded to ({block_n}, 128)")
    if valid_n is None:
        valid_n = n
    q = queries.shape[0]
    q_pad = _round_up(max(q, 8), 8)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))

    qf = queries.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(qf), axis=1, keepdims=True)
    s1 = jnp.maximum(absmax, 1e-9) / 127.0  # [q_pad, 1]
    scaled = qf / s1
    q1f = jnp.round(jnp.clip(scaled, -127.0, 127.0))
    q1 = q1f.astype(jnp.int8)
    if precise:
        # residual at the fixed s1/128 grid: |scaled - q1f| ≤ 0.5 →
        # 128·residual ∈ [−64, 64] fits int8 exactly
        q2 = jnp.round(128.0 * (scaled - q1f)).astype(jnp.int8)
    else:
        q2 = None

    num_blocks = n // block_n
    num_groups = block_n // group_l
    cs_row = corpus_scale.astype(jnp.float32).reshape(1, n)

    q_spec = pl.BlockSpec(
        (q_pad, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
    )
    c_spec = pl.BlockSpec(
        (block_n, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [q_spec]
    if precise:
        in_specs.append(q_spec)
    in_specs.append(c_spec)
    if corpus_res is not None:
        if corpus_res.shape != (n, d) or corpus_res.dtype != jnp.int8:
            raise ValueError(
                f"corpus_res must be int8 {(n, d)}, got "
                f"{corpus_res.dtype} {corpus_res.shape}"
            )
        in_specs.append(c_spec)
    in_specs.append(
        pl.BlockSpec((1, block_n), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q_pad, num_groups), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, num_groups), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ],
    )

    valid_arr = jnp.asarray([valid_n], jnp.int32)
    body = functools.partial(
        _partial_topk_kernel_int8, block_n=block_n, group_l=group_l,
        argmax_mode=argmax_mode,
    )
    if precise and corpus_res is not None:
        kernel = body
        operands = (valid_arr, q1, q2, corpus_q, corpus_res, cs_row)
    elif precise:
        def kernel(valid_ref, q1_ref, q2_ref, c_ref, cs_ref, vals_ref, idx_ref):
            body(valid_ref, q1_ref, q2_ref, c_ref, None, cs_ref, vals_ref, idx_ref)

        operands = (valid_arr, q1, q2, corpus_q, cs_row)
    elif corpus_res is not None:
        def kernel(valid_ref, q1_ref, c_ref, c2_ref, cs_ref, vals_ref, idx_ref):
            body(valid_ref, q1_ref, None, c_ref, c2_ref, cs_ref, vals_ref, idx_ref)

        operands = (valid_arr, q1, corpus_q, corpus_res, cs_row)
    else:
        def kernel(valid_ref, q1_ref, c_ref, cs_ref, vals_ref, idx_ref):
            body(valid_ref, q1_ref, None, c_ref, None, cs_ref, vals_ref, idx_ref)

        operands = (valid_arr, q1, corpus_q, cs_row)

    n_mm_cost = 1 + (1 if precise else 0) + (1 if corpus_res is not None else 0)
    compiler_params = None
    if not interpret:
        # scoped-VMEM budget model (mirrors the bf16 path): int8 blocks
        # double-buffered, i32 matmul accumulators + the f32 converted
        # scores live simultaneously before the reduce
        n_mm = n_mm_cost
        need = (
            (4 if corpus_res is not None else 2) * block_n * d  # dbuf int8 blocks
            + (2 if precise else 1) * q_pad * d  # int8 queries
            + (n_mm + 1) * q_pad * block_n * 4  # i32 accs + f32
            + 2 * block_n * 4  # scales row (double-buffered)
            + 2 * q_pad * (block_n // group_l) * 8  # out tiles
        )
        cap = max(48, min(110, need // (1024 * 1024) + 20))
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(cap) * 1024 * 1024
        )
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, num_blocks * num_groups), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, num_blocks * num_groups), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_mm_cost * 2 * q_pad * n * d,
            bytes_accessed=(2 if corpus_res is not None else 1) * n * d
            + n * 4
            + q_pad * d,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)

    vals, idx = _candidates_topk(cand_vals, cand_idx, k, q, tail=tail, tail_rt=tail_rt)
    # per-query scale: constant within a row, so it commutes with every
    # row-wise reduction above — applied once over [q, k]
    return vals * s1[:q], idx
