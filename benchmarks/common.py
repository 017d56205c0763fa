"""Shared benchmark harness utilities.

Timing rules for the axon remote TPU tunnel (see ARCHITECTURE.md §8):
rotate inputs per timed call, use host fetches as barriers, and measure
throughput on pipelined streams.
"""

from __future__ import annotations

import json
import time

import numpy as np


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 4), "unit": unit, **extra}))


def timed_min(fn, inputs: list, *, fetch=lambda out: np.asarray(out[0])) -> float:
    """Min wall time of fn over rotated inputs; host-fetch as barrier."""
    fetch(fn(inputs[-1]))  # warmup/compile
    times = []
    for x in inputs[:-1]:
        t0 = time.perf_counter()
        fetch(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def device_corpus(n: int, d: int, dtype="bfloat16", seed: int = 0):
    """Unit-norm corpus generated on device (host→device uploads through
    the tunnel are slow — generate in place)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen():
        c = jax.random.normal(jax.random.PRNGKey(seed), (n, d), jnp.float32)
        return (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(dtype)

    return gen()


def device_clustered_corpus(
    n: int, d: int, *, n_clusters: int = 1024, sigma: float = 0.35,
    dtype="bfloat16", seed: int = 0,
):
    """Unit-norm mixture-of-Gaussians corpus generated on device.

    Real embedding corpora are clustered (that is what makes IVF work at
    all); a uniform-random corpus has no partition structure and makes
    every IVF recall number meaningless. sigma is the expected NORM of
    the noise relative to the unit-norm center (per-dim std = sigma/√d),
    so cluster tightness is dimension-independent."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen():
        kc, ki, kn = jax.random.split(jax.random.PRNGKey(seed), 3)
        centers = jax.random.normal(kc, (n_clusters, d), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        ids = jax.random.randint(ki, (n,), 0, n_clusters)
        noise = jax.random.normal(kn, (n, d), jnp.float32) * (
            sigma / jnp.sqrt(jnp.float32(d))
        )
        pts = centers[ids] + noise
        return (pts / jnp.linalg.norm(pts, axis=1, keepdims=True)).astype(dtype)

    return gen()


def device_queries(g: int, q: int, d: int, seeds=(1, 2, 3, 4)):
    import jax
    import jax.numpy as jnp

    make = jax.jit(lambda k: jax.random.normal(k, (g, q, d), jnp.float32))
    return [make(jax.random.PRNGKey(s)) for s in seeds]
