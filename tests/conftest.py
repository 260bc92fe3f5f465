"""Test env: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding paths (mesh/pjit/MIPS merge/all_gather negatives) are
validated on this virtual mesh; real-TPU perf is exercised by bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon TPU PJRT plugin ignores JAX_PLATFORMS; force CPU via config too
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8, f"expected 8 virtual devices, got {d}"
    return d
