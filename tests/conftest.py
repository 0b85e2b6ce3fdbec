"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by asking XLA's CPU
backend to expose 8 virtual devices — the standard fake-backend trick for
testing pjit/shard_map. Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu",
# overriding JAX_PLATFORMS=cpu from the environment — re-force CPU here so
# tests run on the 8 virtual CPU devices, not the tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")

# Reuse compiled executables across test processes; exact matmuls so
# golden-value parity tests are meaningful.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from graphsage_tpu.data.synthetic import make_synthetic_graph  # noqa: E402


@pytest.fixture(scope="session")
def toy_graph():
    return make_synthetic_graph(num_nodes=120, num_classes=3, feat_dim=8, seed=7)


@pytest.fixture(scope="session")
def toy_multilabel_graph():
    return make_synthetic_graph(
        num_nodes=120, num_classes=4, feat_dim=8, multilabel=True, seed=11
    )


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
