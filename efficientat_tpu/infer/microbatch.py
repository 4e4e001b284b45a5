"""Model-level micro-batching for serving.

Some models have a per-clip-optimal device batch: dymn10's composed
dynamic-conv graph is fastest around B=64 and *regresses* at larger
batches (505 -> 778 us/clip at B=256, measured on-chip — see
scripts/probe_dymn_batch.py and the note in models/dymn.py), while MN
keeps improving with batch. The right serving shape is then "run the
model at its best micro-batch and scan the rest", all inside one jit:
``lax.map`` compiles the chunk body once and reuses it, so a B=256 call
costs 4x the B=64 program instead of one slow B=256 program.

The reference has no equivalent — torch serving pays whatever the batch
costs (its CUDA grouped conv has the same groups-scale-with-B fold,
models/dymn/dy_block.py:116-127).

Measured limit (2026-08-17, scripts/probe_dymn_batch.py --model): at most
TWO sequential model bodies per compiled program. B=128 as 2x64 hits the
B=64 rate (1828 vs 1824 clips/s); any structure with >= 3 bodies in one
program — lax.map 4x64, a fully unrolled 4x64, even nested 2x(2x64) —
collapses ~50-150x (10-40 clips/s) on this runtime. Batches beyond
2*micro_batch are therefore split on the HOST into separate dispatches
(Tagger.predict max_device_batch); async dispatch pipelines them so the
per-dispatch overhead hides behind device compute.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

# Measured best serving micro-batch for the DyMN family (probe_dymn_batch).
DYMN_MICRO_BATCH = 64
# Largest single-dispatch batch: 2 micro-batches per program (see above).
DYMN_MAX_DEVICE_BATCH = 2 * DYMN_MICRO_BATCH


def microbatched(apply_fn: Callable, micro_batch: Optional[int]) -> Callable:
    """Wrap ``apply_fn(x) -> y`` (same leading batch dim in and out) so
    batches larger than ``micro_batch`` run as a ``lax.map`` over equal
    chunks — at most two per program (the measured cliff above). Falls
    through untouched when the batch is small, does not divide evenly
    (callers pad — the Tagger already pads for meshes), or would need
    more than two chunks (callers host-split instead)."""
    if micro_batch is None:
        return apply_fn

    def run(x):
        b = x.shape[0]
        if b <= micro_batch or b % micro_batch or b > 2 * micro_batch:
            return apply_fn(x)
        xs = x.reshape(b // micro_batch, micro_batch, *x.shape[1:])
        ys = jax.lax.map(apply_fn, xs)
        return ys.reshape(ys.shape[0] * ys.shape[1], *ys.shape[2:])

    return run
