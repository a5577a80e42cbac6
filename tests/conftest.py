"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-chip without a cluster" (SURVEY.md §4):
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives 8 CPU devices that
exercise the same pjit/shard_map partitioning paths as a v5e-8.

Env vars must be set before jax initializes, hence this runs at conftest
import time (before any test module imports jax).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu"; tests must run on the virtual 8-device CPU mesh,
# so re-pin here (config.update wins — backends are initialized lazily).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# the small test models; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test (torch goldens, trainer loops, TP "
        "meshes). Default CI lane: pytest -m 'not slow' (<5 min cold); "
        "full lane: plain pytest (~40 min cold on a shared CPU).")
