"""Sharded index checkpoint/restore (SURVEY.md §5.4 TPU equivalent:
serialized sharded index arrays, reloadable per shard).

Arrays sharded over a mesh axis save as one ``.npz`` per shard plus a
JSON manifest; restore re-places each shard on its device without ever
materializing the full array on one host buffer larger than a shard.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def save_sharded(array: jax.Array, path: Path | str, *, meta: dict | None = None) -> None:
    """Save a row-sharded array: one npz per addressable shard + manifest."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    shards = sorted(array.addressable_shards, key=lambda s: s.index[0].start or 0)
    manifest = {
        "shape": list(array.shape),
        "dtype": str(np.dtype(array.dtype)),
        "num_shards": len(shards),
        "meta": meta or {},
        "shard_rows": [],
    }
    for i, shard in enumerate(shards):
        data = np.asarray(shard.data)
        if not np.issubdtype(data.dtype, np.integer):
            # npz can't hold bf16; floats round-trip through f32
            data = data.astype(np.float32)
        np.savez_compressed(path.with_suffix(f".shard{i}"), data=data)
        start = shard.index[0].start or 0
        manifest["shard_rows"].append([int(start), int(start + data.shape[0])])
    Path(str(path) + ".manifest.json").write_text(json.dumps(manifest))


def load_sharded(path: Path | str, mesh: Mesh, *, dtype=None) -> tuple[jax.Array, dict]:
    """Restore a row-sharded array onto ``mesh`` (data axis). Shard counts
    may differ from save time — rows are re-partitioned evenly."""
    path = Path(path)
    manifest = json.loads(Path(str(path) + ".manifest.json").read_text())
    shape = tuple(manifest["shape"])
    n = shape[0]
    n_dev = mesh.shape["data"]
    if n % n_dev != 0:
        raise ValueError(f"rows {n} not divisible by mesh size {n_dev}")
    per_dev = n // n_dev
    devices = list(mesh.devices.reshape(-1))
    out_dtype = dtype or manifest["dtype"]

    # stream shards from disk, slicing into per-device rows
    buffers = []
    row = 0
    shard_iter = iter(range(manifest["num_shards"]))
    current = None
    current_offset = 0
    for dev_idx in range(n_dev):
        need = per_dev
        parts = []
        while need > 0:
            if current is None or current_offset >= current.shape[0]:
                idx = next(shard_iter)
                current = np.load(f"{path}.shard{idx}.npz")["data"]
                current_offset = 0
            take = min(need, current.shape[0] - current_offset)
            parts.append(current[current_offset : current_offset + take])
            current_offset += take
            need -= take
        block = np.concatenate(parts, axis=0).astype(out_dtype)
        buffers.append(jax.device_put(block, devices[dev_idx]))
        row += per_dev
    sharding = NamedSharding(mesh, P("data", *([None] * (len(shape) - 1))))
    array = jax.make_array_from_single_device_arrays(shape, sharding, buffers)
    return array, manifest["meta"]
