"""Host staging pool: keep host->device transfers on warm pages.

Measured on this TPU (axon tunnel), ``jax.device_put`` of the same
154 MB batch costs **9.1 s from a fresh allocation vs 0.11 s from a
reused buffer**. The decomposition (scripts/probe_transfer.py): ~7 s is
transparent-huge-page first-touch on the fresh mapping (fixed
process-wide by ``utils/host.py``), and the rest is the runtime's
transfer path being slower from never-before-seen mappings. Data loaders
hit the fresh-mapping case every single batch: collate allocates new
output arrays and glibc munmaps freed blocks above the mmap threshold,
so each batch arrives in a brand-new mapping. Together with the THP
opt-out this closes the "host-fed training 100x slower than device-only"
symptom (torch never shows it because its DataLoader pins staging
buffers, hiding the same cost).

``HostStagingPool`` copies each outgoing batch into a small ring of
persistent staging buffers (``np.copyto`` — memory-bound, ~40 ms for
154 MB) and calls ``device_put`` on the warm buffer — transfers then
always read pages the runtime has already seen, independent of the
allocator's behavior:

- Overwrite-after-return is safe: ``device_put`` consumes the host buffer
  before returning (verified empirically — mutating the source right after
  the call does not corrupt the device value), so a slot may be rewritten
  as soon as its *previous* transfer has completed.
- The pool enforces that lazily: before reusing a slot it blocks on the
  device arrays produced from that slot last time — a no-op in steady
  state, where the consuming train step finished long ago.
- Buffers are keyed per slot by leaf position + shape + dtype; a shape
  change (e.g. a last partial batch) just reallocates that slot's buffer.

Use it anywhere batches stream host->device repeatedly: the train CLI
loop, the host-fed bench, long-running serving feeds.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def sync_transfer_mode() -> bool:
    """Should train loops serialize host->device puts with step execution?

    On the axon tunnel runtime, a ``device_put`` issued while an execution
    is in flight stalls ~4-6 s per step (measured: put-only 0.11 s/batch,
    step-only 0.09 s, interleaved 4-6 s — a ~30x pathology in the remote
    runtime's transfer/execute queueing, not in the data). Serializing
    put -> dispatch -> block costs only the lost overlap (~0.1 s/step
    here) and restores full rate. On local TPU runtimes overlap works and
    is worth keeping. Override with ``EAT_SYNC_TRANSFERS=1/0``.
    """
    env = os.environ.get("EAT_SYNC_TRANSFERS")
    if env is not None:
        return env == "1"
    return "PALLAS_AXON_POOL_IPS" in os.environ


class HostStagingPool:
    """Round-robin persistent staging buffers for repeated device_put calls.

    ``slots=2`` double-buffers: one slot's transfer drains while the next
    batch is staged into the other. More slots only help if transfers are
    consumed with a lag greater than one batch.
    """

    def __init__(self, slots: int = 2, stage_on_cpu: bool = False):
        assert slots >= 1
        self._slots = slots
        self._bufs = [dict() for _ in range(slots)]  # (i, shape, dtype) -> array
        self._pending: list = [None] * slots
        self._next = 0
        # On the CPU backend device_put is ZERO-COPY: the device array
        # aliases the source buffer, so staging through reusable buffers
        # would corrupt earlier batches when a slot is rewritten. CPU has
        # no registration cliff either, so the pool passes through
        # untouched there. ``stage_on_cpu`` exists for unit tests only.
        self._stage_on_cpu = stage_on_cpu

    def put(self, tree: Any, sharding: Optional[Any] = None):
        """Stage ``tree``'s array leaves and transfer; returns device tree.

        ``sharding`` is passed through to ``jax.device_put`` (a
        ``Sharding`` applies to every leaf; ``None`` targets the default
        device).
        """
        if not self._stage_on_cpu:
            if sharding is not None:
                platform = next(iter(sharding.device_set)).platform
            else:
                platform = jax.devices()[0].platform
            if platform == "cpu":
                return (jax.device_put(tree, sharding) if sharding is not None
                        else jax.device_put(tree))
        slot = self._next
        self._next = (self._next + 1) % self._slots
        prev = self._pending[slot]
        if prev is not None:
            for leaf in jax.tree.leaves(prev):
                leaf.block_until_ready()
        bufs = self._bufs[slot]
        leaves, treedef = jax.tree.flatten(tree)
        staged = []
        for i, leaf in enumerate(leaves):
            a = np.asarray(leaf)
            if a.ndim == 0:  # scalars: registration cost is per-page, skip
                staged.append(a)
                continue
            key = (i, a.shape, a.dtype)
            buf = bufs.get(key)
            if buf is None:
                # drop stale buffers for this position (shape/dtype changed)
                for k in [k for k in bufs if k[0] == i]:
                    del bufs[k]
                buf = np.empty(a.shape, a.dtype)
                bufs[key] = buf
            np.copyto(buf, a)
            staged.append(buf)
        out = (jax.device_put(treedef.unflatten(staged), sharding)
               if sharding is not None
               else jax.device_put(treedef.unflatten(staged)))
        self._pending[slot] = out
        return out
