"""Measure DyMN whole-model throughput: nhwc vs ftbc residency.

The ftbc path (models/dymn.py::DyMNConfig.layout) keeps the feature map
(F, T, B, C)-resident between stem and tail so the per-block dynamic
depthwise fold's two physical transposes become free reshapes. This probe
measures whether the theory pays off end-to-end on the real chip:
dymn10 inference (mel included) at B=120, fp32 and bf16, both layouts.

Usage: PYTHONPATH=/root/repo python scripts/probe_dymn_layout.py [B]
Prints one JSON line per (dtype, layout).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from efficientat_tpu.utils.common import host_init

SR = 32000
CLIP = 10


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":  # never persist XLA:CPU AOT programs
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig
    from _bench_util import time_device

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        rng.normal(size=(batch, CLIP * SR)).astype(np.float32) * 0.1)

    base = DyMNConfig(t_max=1.0)
    variables = host_init(DyMN(base), jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 1000, 1), jnp.float32))

    for dtype_name in ("float32", "bfloat16"):
        dtype = jnp.dtype(dtype_name)
        for layout in ("nhwc", "ftbc"):
            model = DyMN(dataclasses.replace(base, layout=layout),
                         dtype=dtype)

            def forward(variables, waves, eps):
                mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
                logits, _ = model.apply(variables, mel[..., None], False, 1.0)
                return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

            per = time_device(forward, variables, waves, iters=16)
            print(json.dumps({
                "model": "dymn10", "B": batch, "dtype": dtype_name,
                "layout": layout, "ms": round(per * 1e3, 2),
                "clips_per_s": round(batch / per, 1),
                "compile_s": round(time_device.last_compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
