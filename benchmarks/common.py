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
    # flush=True: benches run piped/detached on the TPU host; without it
    # a timeout-kill discards every already-emitted line (block buffering)
    print(
        json.dumps({"metric": metric, "value": round(value, 4), "unit": unit, **extra}),
        flush=True,
    )


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


def microcluster_chunk_fn(seg_rows: int, d: int, *, group: int = 10,
                          base_radius: float = 0.35):
    """Chunk generator with micro-cluster (near-duplicate) structure.

    Real corpora pair broad topical clustering with MICRO-structure:
    paraphrases, re-chunked overlaps, boilerplate — small tight groups
    whose members are each other's true neighbors, separated from the
    rest of their topic cluster by a margin quantizers can resolve. A
    distribution with neither (every cluster member a near-tie of 12k
    others, margins ~1e-4) makes recall@10 unmeasurable BY ANY quantized
    index: exact-int8 rescoring itself reorders near-ties (measured:
    refined recall plateaus at 0.60 while pool recall hits 0.95 —
    benchmarks/exp_bits_recall.py).

    Each consecutive ``group`` rows share a micro-center = topic center
    + radius-spread offset (norm ~``base_radius``); rows scatter around
    it at ~10% of the micro offset. A query perturbed from any row has
    its group as the true top-``group`` with margin ~``base_radius²``.

    Returns a jittable ``fn(key, centers) -> [seg_rows, d] f32`` of
    unit-norm rows; chunks regenerate from their PRNG key (oracles
    stream exact scores without materializing the corpus).
    """
    import jax
    import jax.numpy as jnp

    if seg_rows % group:
        raise ValueError(f"seg_rows {seg_rows} % group {group} != 0")
    n_micro = seg_rows // group

    def gen(key, centers):
        nlist = centers.shape[0]
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        ids = jax.random.randint(k1, (n_micro,), 0, nlist)
        u = jax.random.normal(k2, (n_micro, d), jnp.float32) / jnp.sqrt(
            jnp.float32(d)
        )
        r_micro = base_radius * jnp.exp(
            jax.random.uniform(
                k3, (n_micro, 1), minval=jnp.log(0.5), maxval=jnp.log(1.5)
            )
        )
        mc = centers[ids] + r_micro * u  # [n_micro, d]
        s_row = 0.1 * r_micro[:, None, :] * jnp.exp(
            jax.random.uniform(
                k5, (n_micro, group, 1), minval=jnp.log(0.5),
                maxval=jnp.log(2.0),
            )
        )
        w = jax.random.normal(
            k4, (n_micro, group, d), jnp.float32
        ) / jnp.sqrt(jnp.float32(d))
        rows = mc[:, None, :] + s_row * w
        rows = rows.reshape(seg_rows, d)
        return rows / jnp.linalg.norm(rows, axis=1, keepdims=True)

    return gen


def device_queries(g: int, q: int, d: int, seeds=(1, 2, 3, 4)):
    import jax
    import jax.numpy as jnp

    make = jax.jit(lambda k: jax.random.normal(k, (g, q, d), jnp.float32))
    return [make(jax.random.PRNGKey(s)) for s in seeds]
