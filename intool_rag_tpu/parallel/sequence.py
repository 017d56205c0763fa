"""Sequence parallelism for the long-context encoder (SURVEY §5.7).

BGE-M3's 8192-token inputs give a per-sequence activation footprint of
S·H per layer; sharding the SEQUENCE axis over the mesh divides both the
activation memory and the attention FLOPs per chip, scaling max context
with chip count. The design follows the TPU-native recipe (scaling-book
style) rather than any torch distributed pattern:

- embeddings / LayerNorm / FFN are position-local → run unchanged on the
  local shard with zero communication;
- attention needs every (q, kv) pair → ring attention: K/V blocks rotate
  around the mesh ring via ``lax.ppermute`` while each chip keeps an
  online-softmax accumulator (running max / sum / weighted value), so no
  chip ever holds more than its own [S/n, S/n] score tile. n−1 ppermute
  hops ride the ICI ring exactly once per layer.

Reference point: the reference has no sequence parallelism at all (its
encoder caps at single-GPU memory; rag/providers/hf/embeddings.py). This
module is the capability the TPU rebuild adds on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def seq_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices with axis ``seq``."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("seq",))


def ring_attention(
    q: jax.Array,  # [B, H, Sq_local, D]
    k: jax.Array,  # [B, H, Sk_local, D]
    v: jax.Array,  # [B, H, Sk_local, D]
    kv_mask: jax.Array,  # [B, Sk_local] 1 = valid
    *,
    axis_name: str,
    scale: float | None = None,
) -> jax.Array:
    """Exact attention over the globally-sharded sequence, called inside
    ``shard_map`` with the sequence dim sharded on ``axis_name``.

    Online-softmax across ring steps keeps the result bit-comparable (up
    to float addition order) to single-device attention; padded KV
    positions are masked at score time, and fully-padded query rows
    degrade to zeros (they are dropped by downstream masked pooling).
    """
    n = jax.lax.psum(1, axis_name)
    b, h, sq, d = q.shape
    scale = scale if scale is not None else 1.0 / d**0.5
    qf = q.astype(jnp.float32) * scale
    neg = jnp.float32(-1e30)  # large-negative instead of -inf: keeps
    # fully-masked rows NaN-free through exp/renorm

    def attend_block(kb, vb, mb, acc, row_max, row_sum):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mb[:, None, None, :] > 0, s, neg)
        new_max = jnp.maximum(row_max, s.max(axis=-1))
        corr = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max[..., None])
        p = jnp.where(mb[:, None, None, :] > 0, p, 0.0)
        row_sum = row_sum * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return acc, new_max, row_sum

    def step(carry, _):
        kb, vb, mb, acc, row_max, row_sum = carry
        acc, new_max, row_sum = attend_block(kb, vb, mb, acc, row_max, row_sum)
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (kb, vb, mb, acc, new_max, row_sum), None

    # init accumulators FROM qf so they carry the same varying-manual-axes
    # type as the loop outputs (shard_map's VMA tracking rejects
    # device-invariant zeros meeting varying carries)
    zero = qf * 0.0
    init = (
        k,
        v,
        kv_mask,
        zero,
        zero[..., 0] + neg,
        zero[..., 0],
    )
    # n−1 rotating steps, then the last block attends WITHOUT the trailing
    # ppermute (whose rotated data would never be read — dead ICI traffic)
    (kb, vb, mb, acc, row_max, row_sum), _ = jax.lax.scan(
        step, init, None, length=n - 1
    )
    acc, _, row_sum = attend_block(kb, vb, mb, acc, row_max, row_sum)
    return acc / jnp.maximum(row_sum[..., None], 1e-30)


def sp_encode_fn(config, mesh: Mesh, *, pool: bool = True):
    """Sequence-parallel encode: ``(params, input_ids [B, S],
    attention_mask [B, S]) -> [B, H]`` (or ``[B, S, H]`` with
    ``pool=False``), with S sharded over the mesh's ``seq`` axis.

    Params are replicated (SP shards activations, not weights — compose
    with TP via a 2-D mesh when weights also need sharding). S must be a
    multiple of the axis size.
    """
    import dataclasses

    from jax import shard_map

    from ..models.encoder import TextEncoder

    axis = "seq"
    cfg = dataclasses.replace(config, ring_axis=axis, flash_min_len=0)
    model = TextEncoder(cfg)

    def local_forward(params, ids, mask, positions):
        return model.apply(
            params, ids, mask, pool=False, positions=positions
        )

    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
    )

    @jax.jit
    def fn(params, input_ids, attention_mask):
        # global RoBERTa position ids (cumsum spans shards)
        positions = (
            jnp.cumsum(attention_mask, axis=1) * attention_mask
            + cfg.pad_token_id
        )
        hidden = sharded(params, input_ids, attention_mask, positions)
        if not pool:
            return hidden.astype(jnp.float32)
        cls = hidden[:, 0, :].astype(jnp.float32)
        return cls / jnp.maximum(
            jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-9
        )

    def place(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(None, axis))
        )

    fn.place_batch = place  # shard inputs over the seq axis up front
    return fn
