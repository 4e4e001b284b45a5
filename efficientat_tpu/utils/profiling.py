"""Runtime profiling / tracing.

The reference has only analytic profiling (MACs/memory hooks; SURVEY.md §5).
Here real runtime tracing is first-class via ``jax.profiler``:

    from efficientat_tpu.utils.profiling import trace
    with trace("/tmp/jax-trace"):
        step(...)

producing a TensorBoard/Perfetto-compatible trace of XLA ops, plus a
remote-backend-safe timing helper (on tunneled TPU backends only a host
fetch flushes the execution pipeline, so naive ``block_until_ready`` timing
under-reports; ``time_fn`` chains iterations into a device scalar).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1,
            vary: Optional[Callable] = None) -> float:
    """Mean seconds per call of a jitted fn returning arrays.

    Chains every iteration into one device scalar and fetches it once, so
    async/remote dispatch cannot hide execution time. ``vary(args, i)`` may
    perturb inputs per iteration to defeat any dedup along the path.
    """
    def reduce_out(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l) for l in leaves if hasattr(l, "dtype"))

    for _ in range(warmup):
        float(reduce_out(fn(*args)))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(iters):
        a = vary(args, i) if vary is not None else args
        acc = acc + reduce_out(fn(*a)).astype(jnp.float32)
    float(acc)  # single host fetch flushes everything
    return (time.perf_counter() - t0) / iters


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
