"""Shared device-side timing for the ad-hoc bench scripts.

On this remote-TPU tunnel a host-dispatched jit call costs ~20 ms to
enqueue, which deflates B=64 throughput numbers by 2-3x. The fix (same as
bench.py): run the iteration loop ON DEVICE — one dispatch, one scalar
fetch — with a loop-index-dependent input so XLA cannot hoist the body.
"""

from __future__ import annotations

import time

import numpy as np


def time_device(fn, *args, iters: int = 16) -> float:
    """Seconds per iteration of ``fn(*args, eps)`` (eps: traced fp32 scalar
    derived from the loop index; fold it into an input). fn must return a
    scalar; iterations are chained through the accumulator."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *args):
        def body(i, acc):
            return acc + fn(*args, i.astype(jnp.float32) * 1e-7)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    total = float(run(2, *args))  # compile + warm up
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    total = float(run(iters, *args))
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    time_device.last_compile_s = compile_s
    return dt / iters
