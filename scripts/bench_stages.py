"""Stage ablation: where does the full-pipeline time go?

Times (device-side loops, one dispatch each):
- fused Pallas mel alone
- model forward alone (on a precomputed mel)
- full pipeline (mel + model + sigmoid)
for mn10 and dymn10 at B=64, fp32. Prints one JSON line per row.
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

SR = 32000
CLIP = 10
BATCH = 64
ITERS = 32


def _time(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *args):
        def body(i, acc):
            return acc + fn(i.astype(jnp.float32) * 1e-7, *args)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(2, *args))
    t0 = time.perf_counter()
    total = float(run(iters, *args))
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return dt / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        rng.normal(size=(BATCH, CLIP * SR)).astype(np.float32) * 0.1)
    mel0 = log_mel_spectrogram_fused(waves, mel_cfg)[..., None]
    mel0 = jax.device_put(mel0)

    rows = {}
    rows["mel_fused"] = _time(
        lambda eps, w: jnp.sum(log_mel_spectrogram_fused(w + eps, mel_cfg)), waves)

    for tag, (model, extra) in {
        "mn10": (MN(MNConfig()), ()),
        "dymn10": (DyMN(DyMNConfig(t_max=1.0)), (False, 1.0)),
    }.items():
        variables = host_init(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 1000, 1), jnp.float32))
        variables = jax.device_put(variables)

        def model_only(eps, v, m):
            logits, _ = model.apply(v, m + eps, *extra)
            return jnp.sum(jax.nn.sigmoid(logits))

        def full(eps, v, w):
            mel = log_mel_spectrogram_fused(w + eps, mel_cfg)
            logits, _ = model.apply(v, mel[..., None], *extra)
            return jnp.sum(jax.nn.sigmoid(logits))

        rows[f"{tag}_model_only"] = _time(model_only, variables, mel0)
        rows[f"{tag}_full"] = _time(full, variables, waves)

    for k, v in rows.items():
        print(json.dumps({
            "stage": k, "ms_per_batch": round(v * 1e3, 3),
            "clips_per_s": round(BATCH / v, 1),
        }))


if __name__ == "__main__":
    main()
