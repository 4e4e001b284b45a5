"""Analytic receptive field over (frequency, time).

Reference: helpers/receptive_field.py:10-43 — collect (kernel, stride,
dilation) of every conv in forward order, then fold backwards:
rf = s * rf + ((k-1)*d + 1 - s).
"""

from __future__ import annotations

from typing import Tuple, Union

from efficientat_tpu.models.dymn import DyMNConfig
from efficientat_tpu.models.mn import MNConfig
from efficientat_tpu.tools.layer_plan import layer_plan


def receptive_field(cfg: Union[MNConfig, DyMNConfig], input_f: int = 128,
                    input_t: int = 1000) -> Tuple[int, int]:
    convs = [l for l in layer_plan(cfg, input_f, input_t) if l.kind == "conv"]
    rf_f = rf_t = 1
    for l in reversed(convs):
        ek_f = (l.kernel[0] - 1) * l.dilation[0] + 1
        ek_t = (l.kernel[1] - 1) * l.dilation[1] + 1
        rf_f = l.stride[0] * rf_f + (ek_f - l.stride[0])
        rf_t = l.stride[1] * rf_t + (ek_t - l.stride[1])
    return rf_f, rf_t


def report_receptive_field(model_name: str):
    from efficientat_tpu.models.registry import get_model_config

    cfg = get_model_config(model_name).model_cfg
    rf_f, rf_t = receptive_field(cfg)
    print(f"Receptive field of '{model_name}': frequency={rf_f} bins, time={rf_t} frames")
    return rf_f, rf_t
