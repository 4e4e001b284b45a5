"""Ad-hoc DyMN throughput probe on the real chip (B=64, 10 s clips).

Measures the full pipeline (wave -> fused mel -> DyMN -> sigmoid) for
dymn10_as in fp32 and bf16. Prints one JSON line per config.
Timing per tpu-env rules: chain iterations into a device scalar, fetch once.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from efficientat_tpu.utils.common import host_init

BATCH = 64
ITERS = 16
SR = 32000
CLIP = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves_np = rng.normal(size=(BATCH, CLIP * SR)).astype(np.float32) * 0.1
    waves = jnp.asarray(waves_np)

    # each spec: dtype[,ablation-flags]  e.g. "float32,no_dyconv,no_ca"
    for spec_str in sys.argv[1:] or ["float32", "bfloat16"]:
        parts = spec_str.split(",")
        dtype_name = parts[0]
        flags = {f: True for f in parts[1:]}
        dtype = jnp.dtype(dtype_name)
        model = DyMN(DyMNConfig(t_max=1.0, **flags), dtype=dtype)
        variables = host_init(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 1000, 1), jnp.float32))

        from _bench_util import time_device

        def forward(variables, waves, eps):
            mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
            logits, _ = model.apply(variables, mel[..., None], False, 1.0)
            return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

        dt = time_device(forward, variables, waves, iters=ITERS)
        print(json.dumps({
            "model": "dymn10_as", "spec": spec_str, "batch": BATCH,
            "clips_per_s": round(BATCH / dt, 2),
            "compile_s": round(time_device.last_compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
