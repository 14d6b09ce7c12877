"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without a pod via XLA's host-platform
device-count flag (the standard fake-multi-device trick). The axon TPU
plugin registers itself through sitecustomize and overrides the
JAX_PLATFORMS env var, so the platform must be forced through jax.config
*after* importing jax but before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
