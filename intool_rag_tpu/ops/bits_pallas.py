"""Pallas probed-scan kernel over planar binary residual codes.

The capacity tier this serves (``index/bits_index.py``) replaces the
FAISS IVF-PQ role (the reference caps out at ``IndexFlatL2``,
rag/storage/faiss_index.py:106-128 — PQ-class capacity is a new
first-class component per SURVEY §2.9/§7.2#7). Round-3c measurement of
the segment-store prototype showed WHY a kernel is needed: per-row
gathers of 128-byte codes run ~100× below HBM stream speed, and
dequantizing gathered codes to f32 through HBM multiplies the traffic
8× — 50M rows measured 52 QPS. This kernel keeps both off HBM:

- **list-major layout**: each IVF list is a contiguous, block-aligned
  region of the store, so "gather the probed lists" becomes streaming
  contiguous blocks whose addresses are computed from scalar-prefetched
  probe offsets (``PrefetchScalarGridSpec`` — the DMA pipeline sees the
  dynamic block indices early enough to double-buffer);
- **in-VMEM dequantization**: codes stream as packed bits (16 B/row at
  d1024) and are unpacked to scaled ±1 bf16 *inside* the kernel, feeding
  the MXU directly — the 8×-wider dequantized form never exists in HBM.

Planar bit packing makes the unpack pure lane arithmetic: byte ``j`` of
a row packs bit-plane ``b`` at dim ``b·(D/8) + j``, so
``concat([(codes >> b) & 1 for b in range(8)], axis=1)`` yields columns
already in dim order (no cross-lane shuffle), and each plane is exactly
one scale group (8 groups/row, like the int1 codes of ivf_residual.py).

Scoring is the exact IVF-residual decomposition ``q·x ≈ q·c_list +
q·r̂``: the centroid term enters as a per-(query, probe) scalar computed
outside the kernel; empty slots carry ``scales[:, 0] = -1`` and score
``-inf`` (a capacity region's unfilled tail must never beat a real row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PLANES = 8  # bit planes per byte == scale groups per row


def encode_bits_planar(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sign-quantize rows to planar-packed bits + per-plane scales.

    ``x [n, d]`` (d % 8 == 0) → ``codes [n, d//8] uint8``,
    ``scales [n, 8] f32`` where plane ``b`` covers dims
    ``[b·d/8, (b+1)·d/8)`` and ``scale_b = mean |x_plane|`` (the optimal
    per-group gain for a sign quantizer). Reconstruction:
    ``x̂[b·w + j] = scale_b · sign(x[b·w + j])`` with w = d//8.
    """
    n, d = x.shape
    if d % N_PLANES:
        raise ValueError(f"d={d} must be divisible by {N_PLANES}")
    w = d // N_PLANES
    planes = x.reshape(n, N_PLANES, w)
    scales = jnp.mean(jnp.abs(planes), axis=2)  # [n, 8]
    bits = (planes >= 0).astype(jnp.uint8)
    shifts = jnp.arange(N_PLANES, dtype=jnp.uint8)[None, :, None]
    codes = jnp.sum(bits << shifts, axis=1).astype(jnp.uint8)  # [n, w]
    return codes, scales


def decode_bits_planar(codes: jax.Array, scales: jax.Array) -> jax.Array:
    """Inverse of :func:`encode_bits_planar` (oracle/tests)."""
    n, w = codes.shape
    ci = codes.astype(jnp.int32)
    planes = [
        (2 * ((ci >> b) & 1) - 1).astype(jnp.float32)
        * scales[:, b : b + 1].astype(jnp.float32)
        for b in range(N_PLANES)
    ]
    return jnp.concatenate(planes, axis=1)  # [n, 8w]


def _bits_scan_kernel(
    pb_ref,  # scalar prefetch: probe start BLOCK index [QT, nprobe] i32
    q_ref,  # [8, D] bf16 query tile
    codes_ref,  # [block_n, D//8] uint8
    scales_ref,  # [1, 8, block_n] f32 (block-major store, see wrapper)
    csel_ref,  # [8, nprobe] f32 centroid dots of the tile's probes
    vals_ref,  # out [8, lw] f32
    idx_ref,  # out [8, lw] i32 (store SLOT ids)
    *,
    block_n: int,
    group_l: int,
):
    qt = pl.program_id(0)
    p = pl.program_id(1)
    bi = pl.program_id(2)

    ci = codes_ref[:].astype(jnp.int32)  # [bn, W]
    sc = scales_ref[0]  # [8, bn] — slots along LANES (minor-dim tiling
    # exact in HBM; an [N, 8] layout would pad 8 lanes to 128 = 16×)
    w = ci.shape[1]
    # per-plane partial matmul, scale applied to the RESULT along lanes
    # (no sublane↔lane relayout anywhere): plane b covers dims
    # [b·W, (b+1)·W) of the planar packing, q·r̂ = Σ_b scale_b ⊙ (q_b·s_b)
    # select probe p's centroid-dot column via a one-hot masked sum —
    # Mosaic rejects dynamic LANE indexing (csel_ref[:, p] lowers to a
    # vector.load with a dynamic lane index and fails to compile)
    nprobe = csel_ref.shape[1]
    p_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (8, nprobe), 1) == p
    )
    cent_col = jnp.sum(
        jnp.where(p_mask, csel_ref[:], 0.0), axis=1, keepdims=True
    )  # [8, 1] = q·c_list for this probe
    scores = cent_col * jnp.ones((1, block_n), jnp.float32)
    for b in range(N_PLANES):
        pm1 = (2 * ((ci >> b) & 1) - 1).astype(jnp.bfloat16)  # [bn, W]
        qb = q_ref[:, b * w : (b + 1) * w]  # [8, W]
        part = jax.lax.dot_general(
            qb,
            pm1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, bn]
        scores = scores + part * sc[b, :][None, :]
    valid = sc[0, :] >= 0.0  # empty capacity slots carry scale[0] = -1
    scores = jnp.where(valid[None, :], scores, -jnp.inf)

    lw = block_n // group_l
    scores3 = scores.reshape(8, group_l, lw)
    gmax = jnp.max(scores3, axis=1)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (8, group_l, lw), 1)
    garg = jnp.min(
        jnp.where(scores3 == gmax[:, None, :], j_iota, group_l), axis=1
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, lw), 1)
    base = (pb_ref[qt, p] + bi) * block_n
    vals_ref[:, :] = gmax
    idx_ref[:, :] = base + garg * lw + lane


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "blocks_per_list", "block_n", "group_l", "interpret", "tail",
    ),
)
def ivf_bits_topk_pallas(
    queries: jax.Array,  # [Q, D] f32 (Q % 8 == 0; caller pads)
    codes: jax.Array,  # [N_cap, D//8] uint8, list-major block-aligned
    scales: jax.Array,  # [N_cap/block_n, 8, block_n] f32 block-major;
    # scales[:, 0, :] < 0 = empty slot. Block-major because Mosaic only
    # accepts DYNAMIC block indices on non-lane dimensions (a [8, N]
    # layout put the dynamic probe offset on the lane axis: "cannot
    # statically prove that index in dimension 1 is a multiple of 128")
    probe_blocks: jax.Array,  # [Q//8, nprobe] i32 start block of each probe
    c_sel: jax.Array,  # [Q, nprobe] f32 per-query centroid dots
    k: int,
    *,
    blocks_per_list: int,
    block_n: int = 1024,
    group_l: int = 8,
    interpret: bool = False,
    tail: str = "fold",
) -> tuple[jax.Array, jax.Array]:
    """Fused probed scan over binary residual codes. Returns
    ``(scores [Q, k] f32, SLOT ids [Q, k] i32)`` — callers map slots to
    global row ids via the store's gid table. All 8 queries of a tile
    share the tile's probe list (callers sort queries by nearest
    centroid so tiles are cluster-coherent); each query keeps its own
    centroid dot in ``c_sel``. ``blocks_per_list`` is implied by the
    caller passing probe starts in block units and every list region
    being the same whole number of blocks.
    """
    q, d = queries.shape
    n_cap, w = codes.shape
    if q % 8:
        raise ValueError("pad queries to a multiple of 8")
    if w * N_PLANES != d:
        raise ValueError(f"codes width {w} != D/8 = {d // N_PLANES}")
    if n_cap % block_n:
        raise ValueError("store not block-aligned")
    if scales.shape != (n_cap // block_n, N_PLANES, block_n):
        raise ValueError(
            "scales must be block-major [N_cap/block_n, 8, block_n], got "
            f"{scales.shape}"
        )
    if block_n % group_l or (block_n // group_l) % 128 and not interpret:
        raise ValueError(
            f"block_n/group_l = {block_n // group_l} must be a multiple of"
            " 128 (Mosaic output-tile constraint)"
        )
    qt_n, nprobe = probe_blocks.shape
    if qt_n != q // 8 or c_sel.shape != (q, nprobe):
        raise ValueError("probe_blocks/c_sel shape mismatch")
    lw = block_n // group_l

    qb = queries.astype(jnp.bfloat16)
    grid = (q // 8, nprobe, blocks_per_list)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (8, d), lambda qt, p, bi, pb: (qt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_n, w),
                lambda qt, p, bi, pb: (pb[qt, p] + bi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N_PLANES, block_n),
                lambda qt, p, bi, pb: (pb[qt, p] + bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, nprobe), lambda qt, p, bi, pb: (qt, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (8, lw),
                lambda qt, p, bi, pb: (qt, p * blocks_per_list + bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, lw),
                lambda qt, p, bi, pb: (qt, p * blocks_per_list + bi),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    kernel = functools.partial(
        _bits_scan_kernel, block_n=block_n, group_l=group_l
    )
    n_cand = nprobe * blocks_per_list * lw
    compiler_params = None
    if not interpret:
        need = (
            2 * block_n * (w + 4 * N_PLANES)  # double-buffered codes+scales
            + block_n * d * 2  # unpacked ±1 bf16 block
            + 8 * block_n * 4  # f32 scores
            + 8 * d * 2
        )
        cap_mb = max(48, min(110, need // (1024 * 1024) + 20))
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(cap_mb) * 1024 * 1024
        )
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, n_cand), jnp.float32),
            jax.ShapeDtypeStruct((q, n_cand), jnp.int32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(probe_blocks, qb, codes, scales, c_sel)

    cand_vals, cand_idx = jax.lax.optimization_barrier((cand_vals, cand_idx))
    k_eff = min(k, n_cand)
    if tail == "fold" and n_cand >= 8 * k_eff:
        half = n_cand // 2
        a, b = cand_vals[:, :half], cand_vals[:, half : 2 * half]
        take_a = a >= b
        fold_vals = jnp.where(take_a, a, b)
        fold_idx = jnp.where(
            take_a, cand_idx[:, :half], cand_idx[:, half : 2 * half]
        )
        top_vals, top_pos = jax.lax.approx_max_k(
            fold_vals, k_eff, recall_target=0.999
        )
        top_idx = jnp.take_along_axis(fold_idx, top_pos, axis=-1)
        return top_vals, top_idx
    from .topk import blocked_topk

    top_vals, top_pos = blocked_topk(cand_vals, k_eff, block=1024)
    return top_vals, jnp.take_along_axis(cand_idx, top_pos, axis=-1)
