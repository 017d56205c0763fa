"""Shared benchmark harness utilities.

Timing rules for the axon remote TPU tunnel (see ARCHITECTURE.md §8):
rotate inputs per timed call, use host fetches as barriers, and measure
throughput on pipelined streams.
"""

from __future__ import annotations

import json
import math
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


def chip_calibration(
    *, size: int = 8192, mm_reps: int = 24, hbm_gb: float = 2.0,
    hbm_reps: int = 24, passes: int = 3,
) -> dict:
    """Measured bf16 TFLOP/s and HBM GB/s of THIS chip/session.

    ARCHITECTURE.md §2: axon sessions calibrate anywhere down to ~60% of
    nominal (118.5 TFLOP/s / 487 GB/s observed in round 3c vs the
    nominal 197 / 819), so absolute throughput numbers are comparable
    across sessions only next to a same-session calibration. Round-4
    verdict item 5: every bench emits these fields so driver-to-driver
    headline drift is attributable (chip throttle vs regression).

    Method (tunnel rules, ARCHITECTURE.md §8): both probes chain
    ``mm_reps``/``hbm_reps`` data-dependent iterations inside ONE
    ``lax.scan`` launch so the ~40 ms RPC cost amortizes; inputs rotate
    across timed passes so identical launches cannot short-circuit; the
    HBM probe reduces ``sum(|x - s_i|)`` (not factorable, so XLA cannot
    hoist the array read out of the loop). Best-of-``passes`` is
    reported — calibration measures the chip's ceiling, not scheduling
    noise. Cost ≈ 2 s on a v5e-class chip. Returns {} off-TPU."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if jax.default_backend() != "tpu":
        return {}

    inv = jnp.bfloat16(1.0 / math.sqrt(size))

    @jax.jit
    def mm_chain(a, b):
        def step(c, _):
            return ((a @ c) * inv).astype(jnp.bfloat16), ()

        out, _ = lax.scan(step, b, None, length=mm_reps)
        return out[0, 0]

    gen = jax.jit(
        lambda s: jax.random.normal(
            jax.random.PRNGKey(s), (size, size), jnp.float32
        ).astype(jnp.bfloat16)
    )
    a = gen(0)
    bs = [gen(s) for s in (1, 2, 3, 4)]
    np.asarray(mm_chain(a, bs[-1]))  # compile+warm
    mm_t = []
    for b in bs[:passes]:
        t0 = time.perf_counter()
        np.asarray(mm_chain(a, b))
        mm_t.append(time.perf_counter() - t0)
    tflops = mm_reps * 2 * size**3 / min(mm_t) / 1e12

    n_elems = int(hbm_gb * 1e9 / 2)  # bf16
    xgen = jax.jit(
        lambda s: jax.random.normal(
            jax.random.PRNGKey(s), (n_elems,), jnp.float32
        ).astype(jnp.bfloat16)
    )

    @jax.jit
    def hbm_chain(x, scales):
        def step(acc, s):
            return acc + jnp.sum(jnp.abs(x - s).astype(jnp.float32)), ()

        out, _ = lax.scan(step, jnp.float32(0.0), scales)
        return out

    xs = [xgen(s) for s in (10, 11)]
    scales = jnp.linspace(0.0, 1.0, hbm_reps, dtype=jnp.bfloat16)
    np.asarray(hbm_chain(xs[-1], scales))
    hbm_t = []
    for i in range(passes):
        x = xs[i % len(xs)]
        t0 = time.perf_counter()
        np.asarray(hbm_chain(x, scales + jnp.bfloat16(1e-3 * i)))
        hbm_t.append(time.perf_counter() - t0)
    gbps = hbm_reps * n_elems * 2 / min(hbm_t) / 1e9
    # free probe arrays before the caller allocates its corpus
    del a, bs, xs
    return {
        "cal_tflops_bf16": round(tflops, 1),
        "cal_hbm_gbps": round(gbps, 1),
    }


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
