"""Test configuration: force CPU with a virtual 8-device mesh.

This is the JAX-native "fake cluster": multi-device sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices, so the full pjit
path is exercised without TPU hardware (SURVEY.md §4d).

Note: the environment's sitecustomize registers a remote TPU PJRT plugin
(axon) and forces ``jax_platforms`` programmatically, so an env var alone
is not enough — we must override via ``jax.config`` before first backend
use. XLA_FLAGS must be set before that first use as well.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
