"""Sequence parallelism (ring attention) parity tests on the 8-device
CPU mesh: the SP program must reproduce single-device encoder outputs
exactly up to float reduction order (SURVEY §5.7 — the capability the
reference's single-GPU encoder lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intool_rag_tpu.models.encoder import EncoderConfig, encode_fn, init_params
from intool_rag_tpu.parallel.sequence import ring_attention, seq_mesh, sp_encode_fn

pytestmark = pytest.mark.multichip


def _tiny(s_max=64):
    return EncoderConfig(
        vocab_size=512,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        max_position=s_max + 4,
        dtype="float32",
    )


def test_ring_attention_matches_full_attention():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = seq_mesh()
    b, h, s, d = 2, 4, 64, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    mask[0, 40:] = 0  # padded tail on one row
    mask = jnp.asarray(mask)

    ring = shard_map(
        lambda q, k, v, m: ring_attention(q, k, v, m, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
    )
    got = np.asarray(ring(q, k, v, mask))

    ref = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        mask=mask[:, None, None, :].astype(bool),
    ).transpose(0, 2, 1, 3)
    # padded QUERY rows differ by convention (ring → zeros; XLA → uniform
    # average) — they are discarded downstream, so compare valid rows
    valid = np.asarray(mask)
    for bi in range(b):
        np.testing.assert_allclose(
            got[bi][:, valid[bi] > 0],
            np.asarray(ref)[bi][:, valid[bi] > 0],
            atol=2e-5,
        )


def test_sp_encoder_matches_single_device():
    cfg = _tiny()
    params = init_params(cfg, seed=3)
    mesh = seq_mesh()
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 512, (4, 64)).astype(np.int32)
    mask = np.ones((4, 64), np.int32)
    mask[1, 50:] = 0
    mask[3, 17:] = 0

    ref = np.asarray(encode_fn(cfg)(params, jnp.asarray(ids), jnp.asarray(mask)))

    sp = sp_encode_fn(cfg, mesh)
    got = np.asarray(
        sp(params, sp.place_batch(jnp.asarray(ids)), sp.place_batch(jnp.asarray(mask)))
    )
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_sp_encoder_unpooled_hidden_parity():
    cfg = _tiny()
    params = init_params(cfg, seed=5)
    mesh = seq_mesh()
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 512, (2, 32)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[0, 20:] = 0

    from intool_rag_tpu.models.encoder import TextEncoder

    ref = np.asarray(
        TextEncoder(cfg).apply(params, jnp.asarray(ids), jnp.asarray(mask), pool=False)
    )
    sp = sp_encode_fn(cfg, mesh, pool=False)
    got = np.asarray(
        sp(params, sp.place_batch(jnp.asarray(ids)), sp.place_batch(jnp.asarray(mask)))
    )
    # compare valid positions only (padded rows are masked downstream)
    valid = mask > 0
    np.testing.assert_allclose(got[valid], ref[valid], atol=3e-5)
