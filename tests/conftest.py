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

# NO persistent compilation cache for the CPU test suite. It was enabled
# here once (r4) and had to be ripped out: XLA:CPU's serialized-executable
# cache is UNSOUND on this stack — an 8-device SPMD train-step program
# (test_train_step_bce_kd_on_mesh) compiles fresh and passes, then the
# very same entry loaded back from disk by the next process dies in a
# silent abort() (SIGILL class; jax 0.9.0, same host that wrote it —
# reproduced 3x, including on a cache written from scratch by one clean
# run). A test tier that passes on its first run and SIGABRTs on every
# rerun is strictly worse than a slower tier, so the fast tier gets its
# speed from test sizing (tiny widths/shapes, `-m "not slow"`), not from
# caching. The TPU benches keep their persistent cache: TPU executables
# take a different (re)load path and have round-tripped across r2-r4
# sessions without a single fault.
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    del os.environ["JAX_COMPILATION_CACHE_DIR"]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The env-var delete above is a no-op when jax was already imported at
# interpreter startup (this environment's sitecustomize does exactly that):
# jax latches the env var into config at import time. Clear the latched
# value too, or the unsound CPU cache silently re-enables (ADVICE r4).
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
