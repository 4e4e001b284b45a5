"""Learning-rate schedules.

Reference: ``exp_warmup_linear_down`` (helpers/utils.py:56-84) — exponential
ramp-up (exp(-5(1-e/w)^2), epoch clipped to [0.5, w]) times a linear
ramp-down from ``start`` over ``rampdown_length`` epochs to ``last_value``.
The reference steps its LambdaLR once per EPOCH (ex_audioset.py:201);
``per_epoch_schedule`` converts that to an optax per-step schedule that is
piecewise-constant within an epoch.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def exp_rampup(rampup_length: int) -> Callable[[float], float]:
    def f(epoch):
        if epoch < rampup_length:
            epoch = min(max(epoch, 0.5), rampup_length)
            phase = 1.0 - epoch / rampup_length
            return float(math.exp(-5.0 * phase * phase))
        return 1.0
    return f


def linear_rampdown(rampdown_length: int, start: int = 0,
                    last_value: float = 0.0) -> Callable[[float], float]:
    def f(epoch):
        if epoch <= start:
            return 1.0
        if epoch - start < rampdown_length:
            return last_value + (1.0 - last_value) * (rampdown_length - epoch + start) / rampdown_length
        return last_value
    return f


def exp_warmup_linear_down(warmup: int, rampdown_length: int, start_rampdown: int,
                           last_value: float) -> Callable[[float], float]:
    up = exp_rampup(warmup)
    down = linear_rampdown(rampdown_length, start_rampdown, last_value)
    return lambda epoch: up(epoch) * down(epoch)


def per_epoch_schedule(epoch_fn: Callable[[float], float], base_lr: float,
                       steps_per_epoch: int):
    """optax-compatible step schedule applying ``epoch_fn`` per whole epoch.

    Precomputes a lookup table so the schedule works on traced step counters
    without python control flow (the epoch factor functions are host-side).
    """
    table = jnp.asarray([base_lr * epoch_fn(e) for e in range(4096)], jnp.float32)

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, table.shape[0] - 1)
        return table[epoch]

    return schedule
