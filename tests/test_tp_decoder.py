"""Tensor-parallel decoder serving (SURVEY §2.9): Megatron-style param
shardings over the mesh `model` axis must produce EXACTLY the
single-device greedy tokens — GSPMD inserts the collectives; the
generate program is unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from intool_rag_tpu.models.decoder import (
    DecoderConfig,
    init_decoder_params,
    make_generate_fn,
)
from intool_rag_tpu.parallel.tp_decoder import (
    decoder_param_spec,
    shard_decoder_params,
    validate_tp,
)

pytestmark = pytest.mark.multichip


def _cfg():
    return DecoderConfig(
        vocab_size=257,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        intermediate_size=128,
        max_position=256,
        dtype="float32",
    )


def _mesh(tp: int) -> Mesh:
    devs = np.array(jax.devices()[:tp]).reshape(tp)
    return Mesh(devs, ("model",))


def test_tp_decode_matches_single_device(rng):
    config = _cfg()
    params = init_decoder_params(config)
    fn = make_generate_fn(config, max_new_tokens=12, temperature=0.0)
    prompts = rng.integers(5, 250, size=(2, 16)).astype(np.int32)
    mask = np.ones_like(prompts)
    key = jax.random.PRNGKey(0)
    want = np.asarray(fn(params, jnp.asarray(prompts), jnp.asarray(mask), key))

    mesh = _mesh(2)
    assert validate_tp(config, mesh) == 2
    sharded = shard_decoder_params(params, mesh)
    # spot-check the sharding layout took
    qk = sharded["params"]["layer_0"]["attn"]["q_proj"]["kernel"]
    assert qk.sharding.spec == decoder_param_spec(
        (jax.tree_util.DictKey("params"), jax.tree_util.DictKey("layer_0"),
         jax.tree_util.DictKey("attn"), jax.tree_util.DictKey("q_proj"),
         jax.tree_util.DictKey("kernel")), qk, tp=2,
    )
    # odd vocab (257) cannot shard: lm_head replicates instead of crashing
    lm = sharded["params"]["lm_head"]["kernel"]
    assert lm.sharding.spec in (jax.sharding.PartitionSpec(), jax.sharding.PartitionSpec(None, None))
    with jax.set_mesh(mesh):
        got = np.asarray(
            fn(sharded, jnp.asarray(prompts), jnp.asarray(mask), key)
        )
    np.testing.assert_array_equal(got, want)


def test_tp_validate_rejects_indivisible():
    config = DecoderConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=3,
        num_kv_heads=3, intermediate_size=96, max_position=64,
        dtype="float32",
    )
    with pytest.raises(ValueError, match="must divide"):
        validate_tp(config, _mesh(2))


def test_tp_scheduler_serving(rng):
    """The continuous-batching scheduler consumes TP-sharded params
    unchanged: outputs equal the single-device scheduler."""
    from intool_rag_tpu.models.scheduler import ContinuousGenerator

    config = _cfg()
    params = init_decoder_params(config)
    prompts = [rng.integers(5, 250, size=8).tolist() for _ in range(4)]
    limits = [10] * 4
    plain = ContinuousGenerator(config, params, n_slots=2, seg_len=4)
    want, _ = plain.generate_many(prompts, limits)

    mesh = _mesh(2)
    sharded = shard_decoder_params(params, mesh)
    with jax.set_mesh(mesh):
        tp_gen = ContinuousGenerator(config, sharded, n_slots=2, seg_len=4)
        got, _ = tp_gen.generate_many(prompts, limits)
    assert got == want
