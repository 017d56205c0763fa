"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
(mesh + collectives) is exercised without TPU hardware — the standard JAX
pattern (SURVEY.md §4). Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU backend at interpreter startup
# and overrides JAX_PLATFORMS, so env vars alone are not enough — force
# the platform through jax.config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_storage(tmp_path, monkeypatch):
    """Isolated storage dir + fresh config for storage-touching tests."""
    monkeypatch.setenv("STORAGE_DIR", str(tmp_path / "storages"))
    monkeypatch.setenv("CACHE_DIR", str(tmp_path / "storages" / "cache"))
    from intool_rag_tpu import config as config_mod

    cfg = config_mod.reset_config()
    cfg.ensure_dirs()
    yield cfg
    config_mod.reset_config()
