"""Ensemble of taggers: average member logits (models/ensemble.py:8-22).

Members may be heterogeneous (MN and DyMN mixed). Like the reference, the
ensemble returns ``(avg_logits, avg_logits)`` so it is call-compatible with
single models that return (logits, embedding).

TPU note: members run sequentially inside one jit — XLA overlaps their
schedules; for multi-chip serving shard the *batch*, not the members
(members are small; replication is free up to 68M params).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Ensemble(nn.Module):
    configs: Tuple[Any, ...]  # MNConfig | DyMNConfig per member
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, temperature=1.0):
        from efficientat_tpu.models.dymn import DyMN, DyMNConfig
        from efficientat_tpu.models.mn import MN, MNConfig

        logits_sum = None
        for i, cfg in enumerate(self.configs):
            if isinstance(cfg, DyMNConfig):
                out, _ = DyMN(cfg, dtype=self.dtype, name=f"member{i}")(
                    x, train, temperature)
            elif isinstance(cfg, MNConfig):
                out, _ = MN(cfg, dtype=self.dtype, name=f"member{i}")(x, train)
            else:
                raise TypeError(f"unknown member config: {type(cfg)}")
            logits_sum = out if logits_sum is None else logits_sum + out
        avg = logits_sum / len(self.configs)
        return avg, avg
