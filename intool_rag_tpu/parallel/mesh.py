"""Mesh construction helpers.

Axes:
- ``data``  — batch/corpus sharding (DP for training, corpus shards for
  retrieval). Laid out over ICI.
- ``model`` — tensor parallelism for the encoder (attention heads / FFN
  hidden). Kept innermost so TP collectives ride the fastest links.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def corpus_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices: corpus rows sharded on ``data``."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def train_mesh(devices=None, model_parallel: int | None = None) -> Mesh:
    """2-D (data, model) mesh. ``model_parallel`` defaults to 2 when the
    device count allows, else 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n > 1 else 1
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))
