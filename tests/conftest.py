"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests exercise numerics and sharding on host
CPU so they run anywhere (xla_force_host_platform_device_count=8 gives the
parallel tests an 8-device mesh).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The session env pins JAX_PLATFORMS=axon (TPU) and the plugin ignores the
# env override — force CPU through the config before the backend initialises.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is CPU-compile dominated (full-graph
# DAIN compiles take minutes); warm-cache reruns skip XLA entirely.
_cache_dir = os.environ.get(
    "VFIDKR_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
