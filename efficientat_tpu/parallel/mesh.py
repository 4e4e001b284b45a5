"""Device mesh + sharding layout.

The reference's only parallelism is data-parallel DDP over NCCL hidden
behind PyTorch Lightning (ex_pl_audioset.py:287-296). The TPU-native
equivalent is one ``jax.sharding.Mesh`` with a ``data`` axis over ICI:

- batches are sharded along ``data`` (``P('data')``),
- parameters/optimizer state are replicated (models are <= 68M params —
  per the scaling-book recipe, pure DP is the right point in the
  sharding space; no tensor/pipeline split pays for itself at this size),
- gradient all-reduce and eval-pred all-gather are inserted by the XLA
  SPMD partitioner from the sharding annotations; no hand-written
  collectives needed.

A second ``model`` axis is supported for ensemble sharding (each member
on a sub-mesh) but defaults to size 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """1D (or 2D with a model axis) mesh over the first ``n_devices``."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n])
    if model_axis > 1:
        assert n % model_axis == 0
        return Mesh(devices.reshape(n // model_axis, model_axis), ("data", "model"))
    return Mesh(devices, ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree on the mesh, sharded along ``data``."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
