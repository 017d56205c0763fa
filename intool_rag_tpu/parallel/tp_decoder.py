"""Tensor-parallel decoder serving: shard the in-process generator over
the mesh ``model`` axis (SURVEY §2.9; scaling-book recipe: annotate the
weights, let GSPMD insert the collectives).

The reference's generation path is a single-host Ollama process
(rag/providers/ollama/llm.py) and cannot scale past one machine's
memory; this shards `models/decoder.py`'s params Megatron-style so a
checkpoint larger than one chip's HBM serves across the ICI ring:

- attention q/k/v projections shard their OUTPUT (head) dim; o_proj
  shards its INPUT dim — one all-reduce per attention block, inserted
  by GSPMD from the shardings alone;
- MLP gate/up shard the hidden dim, down shards its input — one
  all-reduce per MLP;
- lm_head shards the vocab dim (logits all-gather only at the argmax /
  sample point); embeddings and LayerNorm scales replicate;
- the KV cache shards on its kv-heads axis by propagation (GQA:
  ``num_kv_heads % tp == 0``).

No model-code changes: the existing jitted generate/scheduler programs
consume sharded params directly — sharding is a property of the arrays,
exactly how the train step in ``parallel/train.py`` composes DP×TP.
Exact greedy parity with single-device execution is tested on the CPU
mesh and exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def decoder_param_spec(path: tuple, leaf, axis: str = "model", tp: int = 1):
    """PartitionSpec for one decoder param, keyed by its tree path.
    A dim that ``tp`` does not divide falls back to replication (e.g.
    the byte tokenizer's 257-entry lm_head — real checkpoints' vocabs
    divide every practical tp degree)."""
    names = [getattr(k, "key", str(k)) for k in path]
    last_mod = names[-2] if len(names) >= 2 else ""

    def ok(dim):
        return tp <= 1 or leaf.shape[dim] % tp == 0

    if last_mod in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        return P(None, axis) if ok(1) else P()  # output (head/hidden) dim
    if last_mod in ("o_proj", "down_proj"):
        return P(axis, None) if ok(0) else P()  # input dim (all-reduce)
    if last_mod == "lm_head":
        return P(None, axis) if ok(1) else P()  # vocab; gather at sample
    return P()  # embeddings, LN scales: replicate


def shard_decoder_params(params, mesh: Mesh, axis: str = "model"):
    """device_put every param with its Megatron-style NamedSharding."""
    tp = mesh.shape[axis]

    def place(path, leaf):
        return jax.device_put(
            leaf,
            NamedSharding(mesh, decoder_param_spec(path, leaf, axis, tp)),
        )

    return jax.tree_util.tree_map_with_path(place, params)


def validate_tp(config, mesh: Mesh, axis: str = "model") -> int:
    """Checks the divisibility contract; returns the tp degree."""
    tp = mesh.shape[axis]
    if config.num_kv_heads % tp or config.num_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={config.num_heads} and "
            f"num_kv_heads={config.num_kv_heads}"
        )
    if config.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} must divide intermediate_size={config.intermediate_size}"
        )
    return tp
