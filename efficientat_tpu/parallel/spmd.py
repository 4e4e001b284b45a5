"""Ambient data-parallel lowering context.

Most of the model zoo is natively partitionable: with the batch sharded
``P('data')`` the XLA SPMD partitioner shards every conv / matmul /
elementwise op along the batch dim without communication. The one
exception is the dynamic depthwise conv's batch-into-groups fold
(models/dymn.py::_dynamic_depthwise): its ``(B, F, T, C) -> (1, F, T, B*C)``
reshape merges the sharded batch axis into channels, which under pjit
forces a cross-device regroup (all-gather) of the full activation — the
reference's DDP never sees this because each process folds only its own
local batch (ex_pl_audioset.py:287-296 + models/dymn/dy_block.py:116-127).

The fix mirrors DDP's per-process locality: the train/eval steps — which
know the mesh — publish it here while they trace, and the fold wraps
itself in ``jax.shard_map`` over the ``data`` axis so every device folds
only its own batch shard. Model code stays mesh-agnostic; nothing else
reads this context.

This is a *tracing* context: it must be active while the jitted function
body is traced (the steps enter it inside their own bodies), not at call
time. It is deliberately NOT set by code that is already inside a
``shard_map`` (parallel/ensemble.py) — there the batch is already local.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

_state = threading.local()


@contextlib.contextmanager
def data_parallel_lowering(mesh, axis: str = "data"):
    """Publish ``mesh`` as the ambient data-parallel mesh while tracing.

    No-op when ``mesh`` is None or the data axis has a single device.
    """
    if mesh is None or mesh.shape.get(axis, 1) <= 1:
        yield
        return
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, axis)
    try:
        yield
    finally:
        _state.ctx = prev


def current_data_mesh() -> Optional[Tuple[object, str]]:
    """The ambient (mesh, data-axis-name), or None outside the context."""
    return getattr(_state, "ctx", None)
