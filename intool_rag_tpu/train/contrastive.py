"""Contrastive fine-tuning of the text encoder (InfoNCE, in-batch
negatives — the standard recipe for BGE-class retrieval encoders).

Sharding (Megatron-style TP + DP over a (data, model) mesh):

- batch axis → ``data`` (queries and passages split across DP groups);
  in-batch negatives stay within the local DP shard's gathered batch —
  logits are computed on the ALL-GATHERED passage embeddings so every
  query sees every passage as a negative (standard distributed InfoNCE).
- attention q/k/v and FFN-in kernels shard their output dim over
  ``model``; attention-out and FFN-out shard their input dim (Megatron
  pairing: one all-reduce per block, inserted automatically by GSPMD).
- embeddings and LayerNorms replicate.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import EncoderConfig, TextEncoder


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


# ---------------- sharding rules ----------------

_COL_PARALLEL = ("query", "key", "value", "intermediate")  # shard kernel dim 1
_ROW_PARALLEL = ("output", "mlp_output")  # shard kernel dim 0


def _spec_for(path: tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    if leaf.ndim == 2:
        if any(n in _COL_PARALLEL for n in names) and "kernel" in names:
            return P(None, "model")
        if any(n in _ROW_PARALLEL for n in names) and "kernel" in names:
            return P("model", None)
    return P()  # replicate embeddings, biases, LN


def param_shardings(params, mesh: Mesh):
    def spec(path, leaf):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        return NamedSharding(mesh, _spec_for(names, leaf))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place encoder params with Megatron TP layout over ``mesh``."""
    return jax.device_put(params, param_shardings(params, mesh))


# ---------------- loss / step ----------------


def info_nce_loss(q_emb: jax.Array, p_emb: jax.Array, temperature: float) -> jax.Array:
    """In-batch-negative InfoNCE; both inputs [B, H] unit-norm."""
    logits = q_emb @ p_emb.T / temperature  # [B, B]
    labels = jnp.arange(q_emb.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    config: EncoderConfig,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
) -> Callable:
    """Returns ``train_step(state, batch) -> (state, loss)`` where batch =
    dict(q_ids, q_mask, p_ids, p_mask). Jit + shard outside (see
    __graft_entry__.dryrun_multichip and make_sharded_train_step below)."""
    model = TextEncoder(config)

    def loss_fn(params, batch):
        q = model.apply(params, batch["q_ids"], batch["q_mask"])
        p = model.apply(params, batch["p_ids"], batch["p_mask"])
        return info_nce_loss(q, p, temperature)

    def train_step(state: TrainState, batch: dict) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_sharded_train_step(
    config: EncoderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    temperature: float = 0.05,
):
    """jit the train step with DP batch sharding + TP param sharding."""
    step_fn = make_train_step(config, optimizer, temperature)
    batch_sharding = NamedSharding(mesh, P("data", None))

    def place_batch(batch):
        return {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, place_batch
