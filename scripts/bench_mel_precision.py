"""DFT-GEMM precision study for the fused mel kernel.

For each MXU precision mode (HIGHEST = 6-pass fp32, HIGH = bf16x3,
DEFAULT = single-pass bf16) measures, at B=64 on the TPU:
- time per batch of the fused mel kernel,
- max |delta| of the normalized log-mel vs the float64 numpy oracle,
  over three adversarial signal classes: real audio (demo clip), pure
  sines (deep spectral nulls between partials), and digital silence.

Two error sources are reported separately:
- vs the pure-float64 oracle (f64 bank construction): bounded at ~3e-2 by
  FILTERBANK-CONSTRUCTION rounding — the narrowest low-frequency Kaldi
  triangles cover only ~2 FFT bins, so fp32 mel-scale math shifts their
  weights by ~0.3%. This is shared with the torch reference (torchaudio
  builds banks in fp32 too) and is NOT a kernel error.
- vs the same-fp32-banks oracle: isolates the DFT GEMM precision —
  HIGHEST/bf16x3 sit at fp32-rounding level (~2e-5), single-pass bf16
  is catastrophic at nulls.

The catastrophic case the HIGHEST pin protects against is cancellation at
spectral nulls: power ~ 0 computed as a difference of large cos/sin
projections, then log()'d. The +1e-5 log floor bounds how much absolute
power error matters; this script quantifies whether 3-pass bf16x3 stays
inside fp32-rounding territory (it does; single-pass does not).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

SR = 32000
CLIP = 10
BATCH = 64
ITERS = 32


def make_waves():
    import scipy.io.wavfile
    import scipy.signal

    rng = np.random.default_rng(0)
    waves = np.zeros((BATCH, CLIP * SR), np.float32)
    # real audio: the reference demo clip, tiled
    path = "/root/reference/resources/metro_station-paris.wav"
    if os.path.exists(path):
        sr, pcm = scipy.io.wavfile.read(path)
        demo = pcm.astype(np.float32) / 2 ** 31
        demo = scipy.signal.resample_poly(demo, 320, 441)[: CLIP * SR]
        waves[: BATCH // 2] = demo[None, : CLIP * SR]
    # pure sines: deep nulls between partials
    t = np.arange(CLIP * SR) / SR
    for i in range(BATCH // 2, BATCH - 4):
        waves[i] = 0.3 * np.sin(2 * np.pi * (100 + 37.7 * i) * t).astype(np.float32)
    # silence + near-silence
    waves[BATCH - 4] = 0.0
    waves[BATCH - 3] = 1e-6 * rng.normal(size=CLIP * SR)
    waves[BATCH - 2] = 0.1 * rng.normal(size=CLIP * SR)
    waves[BATCH - 1] = 0.9 * np.sign(np.sin(2 * np.pi * 440 * t))  # square, loud
    return waves


def oracle_logmel(waves, banks=None):
    from test_melspec import oracle_mel_banks, oracle_power_stft

    if banks is None:
        banks = oracle_mel_banks(128, 1024, SR, 0.0, 15000.0)
    banks = np.asarray(banks, np.float64)
    out = []
    for w in waves.astype(np.float64):
        x = w[1:] - 0.97 * w[:-1]
        spec = oracle_power_stft(x, 1024, 320, 800)
        mel = banks @ spec.T
        out.append((np.log(mel + 1e-5) + 4.5) / 5.0)
    return np.stack(out)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.mel_pallas import stft_log_mel_pallas
    from efficientat_tpu.ops.melspec import MelConfig

    cfg = MelConfig()
    waves = make_waves()
    banks = kaldi_mel_banks(128, 1024, SR, 0.0, 15000.0)
    want = oracle_logmel(waves)                      # pure f64 (banks too)
    want_fp32b = oracle_logmel(waves, np.asarray(banks))  # same fp32 banks
    wj = jnp.asarray(waves)

    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("bf16x3", "bf16x3"),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        @jax.jit
        def run(w, n):
            def body(i, acc):
                mel = stft_log_mel_pallas(w + i.astype(jnp.float32) * 1e-9,
                                          banks, cfg, prec)
                return acc + jnp.sum(mel)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        got = np.asarray(stft_log_mel_pallas(wj, jnp.asarray(banks), cfg, prec))
        err = np.abs(got - want)
        float(run(wj, 2))
        t0 = time.perf_counter()
        float(run(wj, ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        err_dft = np.abs(got - want_fp32b)
        print(json.dumps({
            "precision": name,
            "max_abs_err_same_banks": round(float(err_dft.max()), 8),
            "ms_per_batch": round(dt * 1e3, 3),
            "clips_per_s": round(BATCH / dt, 1),
            "max_abs_err": float(err.max()),
            "p999_abs_err": float(np.quantile(err, 0.999)),
        }))


if __name__ == "__main__":
    main()
