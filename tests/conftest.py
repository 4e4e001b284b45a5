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

# Persistent compilation cache (same .jax_cache dir the benches use): the
# compile-heavy model/convert/dryrun tests go from minutes to seconds on a
# warm cache. The env vars alone are too late here (sitecustomize imports
# jax at interpreter startup), so config.update is required in-process; the
# env vars are still exported for the dryrun_multichip re-exec subprocess,
# where they ARE early enough.
_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE = os.path.join(_HERE, ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
