"""Stage-7 probe: reproduce bench.mel_selftest on-device and localize
its XLA-path max error by (wave, mel, frame-class).

Context: probe6 showed the interior of the folded XLA path is 4.0e-6
vs a CORRECT f64 oracle — probes 1-3's 2e-2 readings came from a
periodic-vs-symmetric Hann bug in the probe oracle, not the shipping
code. The r5 bench selftest (correct oracle) still read ~2.5e-2, so
the remaining error should be the reflect-pad EDGE frames patched by
_edge_power. This prints per-wave, edge-vs-interior error splits for
the XLA path and the fused kernel.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu7.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import importlib.util

spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules["benchmod"] = bench
spec.loader.exec_module(bench)

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.mel_pallas import stft_log_mel_pallas
from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

SR = 32000


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(bench.CLIP_SECONDS * SR) / SR
    waves = np.stack([
        rng.normal(size=t.size) * 0.1,
        0.3 * np.sin(2 * np.pi * 440.0 * t),
        0.2 * np.sin(2 * np.pi * 95.5 * t) + 0.01 * rng.normal(size=t.size),
        rng.normal(size=t.size) * 1e-3,
    ]).astype(np.float32)
    w = jnp.asarray(waves)
    banks = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
                            cfg.effective_fmax)
    oracle = bench._mel_oracle_f64(waves, cfg, np.asarray(banks))
    ref = np.asarray(jax.jit(lambda w: log_mel_spectrogram(w, cfg))(w))
    hi = np.asarray(jax.jit(lambda w: stft_log_mel_pallas(
        w, banks, cfg, jax.lax.Precision.HIGHEST))(w))

    out = {}
    for name, got in (("xla", ref), ("pallas_fp32", hi)):
        err = np.abs(got - oracle)  # (4, mel, frames)
        out[name + "_max"] = float(err.max())
        per_wave = {}
        for i in range(4):
            e = err[i]
            am = np.unravel_index(e.argmax(), e.shape)
            per_wave[f"w{i}"] = {
                "max": float(e.max()),
                "argmax_mel_frame": [int(am[0]), int(am[1])],
                "edge_max": float(e[:, [0, 1, e.shape[1] - 1]].max()),
                "interior_max": float(e[:, 2:-1].max()),
            }
        out[name + "_per_wave"] = per_wave
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
