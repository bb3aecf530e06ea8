"""Test harness: force JAX onto a virtual 8-device CPU mesh.

This must run before the first ``import jax`` anywhere in the test session —
pytest imports conftest.py first, so setting the env here is sufficient.
Multi-chip sharding tests (shard_map over a Mesh) run against these 8 fake
CPU devices; real-TPU behavior is exercised by bench.py under the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
