"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip sharding correctness is tested without TPU hardware via XLA's
host-platform device-count override, per the build plan (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the container's sitecustomize may have pinned the axon TPU platform before
# this conftest runs; force the CPU mesh (backends are lazily initialized, so
# this is effective as long as no test module touched a device at import).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache for the CPU test mesh (separate dir from the TPU
# runtime cache): the slow/slowest workload-integration tests are
# XLA-compile-dominated (full-width flagship models), so first run pays the
# compile and repeat suite runs load from cache — this is what bounds the
# `slowest` tier (VERDICT r4 #8) without shrinking test fidelity.
_cache = os.path.expanduser("~/.cache/gennet_tpu_xla_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture
def x64():
    """Enable float64 within a test (for phase-accuracy physics checks)."""
    with jax.enable_x64(True):
        yield
