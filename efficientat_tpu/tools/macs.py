"""MACs / parameter counting (reference: helpers/flop_count.py:7-69).

conv MACs = k_h*k_w * (C_in/groups) * C_out * H_out * W_out (+bias);
linear MACs = weights + bias. Computed from the static layer plan.
"""

from __future__ import annotations

from typing import Union

from efficientat_tpu.models.dymn import DyMNConfig
from efficientat_tpu.models.mn import MNConfig
from efficientat_tpu.tools.layer_plan import layer_plan


def count_macs(cfg: Union[MNConfig, DyMNConfig], input_f: int = 128,
               input_t: int = 1000, verbose: bool = False) -> int:
    plan = layer_plan(cfg, input_f, input_t)
    conv = [l.macs() for l in plan if l.kind == "conv"]
    lin = [l.macs() for l in plan if l.kind == "linear"]
    total = sum(conv) + sum(lin)
    if verbose:
        print("*************Computational Complexity (multiply-adds) **************")
        print("Number of Convolutional Layers: ", len(conv))
        print("Number of Linear Layers: ", len(lin))
        print("Relative Share of Convolutional Layers: {:.2f}".format(sum(conv) / total))
        print("Relative Share of Linear Layers: {:.2f}".format(sum(lin) / total))
        print("Total MACs (multiply-accumulate operations in Billions): {:.2f}".format(total / 10 ** 9))
        print("********************************************************************")
    return total


def count_params(cfg: Union[MNConfig, DyMNConfig]) -> int:
    """Weight/bias parameter count from the plan plus norm affine params.

    (For exact totals the model's real param tree is authoritative; this
    analytic count covers conv/linear weights, the dominant part.)
    """
    return sum(l.params() for l in layer_plan(cfg))
