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


# ---------------- cached-pool trainer (single device / tunnel) ----------------


def tokenize_pairs(tokenizer, queries, passages, *, max_len: int = 32):
    """Tokenize aligned (query, positive-passage) pairs to fixed width."""
    import numpy as np

    def enc(texts):
        ids, mask = tokenizer.encode_batch(texts)
        n, s = ids.shape
        if s >= max_len:
            return ids[:, :max_len], mask[:, :max_len]
        pid = tokenizer.pad_id
        out_i = np.full((n, max_len), pid, np.int32)
        out_m = np.zeros((n, max_len), np.int32)
        out_i[:, :s] = ids
        out_m[:, :s] = mask
        return out_i, out_m

    q_ids, q_mask = enc(queries)
    p_ids, p_mask = enc(passages)
    return {"q_ids": q_ids, "q_mask": q_mask, "p_ids": p_ids, "p_mask": p_mask}


def train_encoder_cached(
    config: EncoderConfig,
    pool: dict,
    *,
    steps: int = 800,
    batch: int = 64,
    lr: float = 1e-3,
    temperature: float = 0.05,
    seed: int = 0,
    steps_per_launch: int = 50,
    init: Any | None = None,
):
    """InfoNCE fine-tune over a device-resident (query, positive) pool
    with the cached-pool ``lax.scan`` trainer pattern (ocr/train.py —
    amortizes the ~40 ms/step tunnel RPC to one per ``steps_per_launch``).
    In-batch negatives come from the sampled batch. Returns
    ``(params, mean_losses per launch)``."""
    from ..models.encoder import init_params

    model = TextEncoder(config)
    params = init if init is not None else init_params(config, seed=seed)
    n = pool["q_ids"].shape[0]
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=max(20, steps // 20),
        decay_steps=steps, end_value=lr * 0.05,
    )
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    opt_state = optimizer.init(params)
    dev = {k: jnp.asarray(v) for k, v in pool.items()}

    @jax.jit
    def launch(params, opt_state, key):
        def one_step(carry, key_t):
            params, opt_state = carry
            idx = jax.random.randint(key_t, (batch,), 0, n)

            def loss_fn(p):
                q = model.apply(p, dev["q_ids"][idx], dev["q_mask"][idx])
                pe = model.apply(p, dev["p_ids"][idx], dev["p_mask"][idx])
                return info_nce_loss(q, pe, temperature)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, steps_per_launch)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses.mean()

    import numpy as np

    key = jax.random.PRNGKey(seed + 1)
    means = []
    for _ in range(-(-steps // steps_per_launch)):
        key, sub = jax.random.split(key)
        params, opt_state, m = launch(params, opt_state, sub)
        means.append(float(m))
    return params, np.asarray(means)
