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

import pytest  # noqa: E402


@pytest.fixture
def x64():
    """Enable float64 within a test (for phase-accuracy physics checks)."""
    with jax.enable_x64(True):
        yield
