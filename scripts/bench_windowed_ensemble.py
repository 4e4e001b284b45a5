"""BASELINE configs 3 + 5: long-form windowed tagging and ensemble serving.

- windowed: dymn10_as over 60 s clips, 10 s window / 2.5 s hop -> all 21
  windows as ONE device batch (the reference loops windows in Python at
  batch 1, windowed_inference.py:101-120). Reports audio-seconds/s.
- ensemble: mn40_as_ext + dymn20_as mean-logit ensemble at B=64.
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


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.infer.windowed import window_signal
    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    mel_cfg = MelConfig()
    rng = np.random.default_rng(0)

    # ---- config 3: windowed long-form (dymn10_as) -----------------------
    clip_seconds = 60.0
    window_s, hop_s = 10.0, 2.5
    wave = rng.normal(size=(int(clip_seconds * SR),)).astype(np.float32) * 0.1
    windows = window_signal(wave, int(window_s * SR), int(hop_s * SR))
    n_win = windows.shape[0]
    model = DyMN(DyMNConfig(t_max=1.0))
    variables = host_init(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 1000, 1), jnp.float32))

    from _bench_util import time_device

    def fwd_windows(variables, w, eps):
        mel = log_mel_spectrogram_fused(w + eps, mel_cfg)
        logits, _ = model.apply(variables, mel[..., None], False, 1.0)
        return jnp.sum(jax.nn.sigmoid(logits))

    wj = jnp.asarray(windows)
    dt = time_device(fwd_windows, variables, wj)
    print(json.dumps({
        "case": "windowed dymn10_as 60s clip (10s win / 2.5s hop, one batch)",
        "n_windows": int(n_win),
        "audio_seconds_per_s": round(clip_seconds / dt, 1),
        "clips60s_per_s": round(1.0 / dt, 2),
    }), flush=True)

    # ---- config 5: mn40_as_ext + dymn20_as ensemble ----------------------
    batch = 64
    mn40 = MN(MNConfig(width_mult=4.0))
    dymn20 = DyMN(DyMNConfig(width_mult=2.0, t_max=1.0))
    v1 = host_init(mn40, jax.random.PRNGKey(1),
                   jnp.zeros((1, 128, 1000, 1), jnp.float32))
    v2 = host_init(dymn20, jax.random.PRNGKey(2),
                   jnp.zeros((1, 128, 1000, 1), jnp.float32))
    waves = jnp.asarray(rng.normal(size=(batch, 10 * SR)).astype(np.float32) * 0.1)

    def fwd_ens(v1, v2, waves, eps):
        mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
        x = mel[..., None]
        l1, _ = mn40.apply(v1, x)
        l2, _ = dymn20.apply(v2, x, False, 1.0)
        return jnp.sum(jax.nn.sigmoid((l1 + l2) / 2.0))

    dt = time_device(fwd_ens, v1, v2, waves)
    print(json.dumps({
        "case": "ensemble mn40_as_ext+dymn20_as, B=64 10s clips",
        "clips_per_s": round(batch / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
