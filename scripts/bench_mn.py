"""MN throughput probe: dtype and width variants (B=64, 10 s clips)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from efficientat_tpu.utils.common import host_init

SR = 32000
CLIP = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)

    # (tag, width, dtype, batch)
    cases = [
        ("mn10_fp32_b64", 1.0, jnp.float32, 64),
        ("mn10_bf16_b64", 1.0, jnp.bfloat16, 64),
        ("mn10_fp32_b256", 1.0, jnp.float32, 256),
        ("mn40_fp32_b32", 4.0, jnp.float32, 32),
        ("mn40_bf16_b32", 4.0, jnp.bfloat16, 32),
    ]
    for tag, width, dtype, batch in cases:
        model = MN(MNConfig(width_mult=width), dtype=dtype)
        variables = host_init(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 1000, 1), jnp.float32))
        waves = jnp.asarray(
            rng.normal(size=(batch, CLIP * SR)).astype(np.float32) * 0.1)

        from _bench_util import time_device

        def forward(variables, waves, eps):
            mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
            logits, _ = model.apply(variables, mel[..., None])
            return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

        dt = time_device(forward, variables, waves)
        print(json.dumps({"case": tag, "clips_per_s": round(batch / dt, 1),
                          "compile_s": round(time_device.last_compile_s, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
