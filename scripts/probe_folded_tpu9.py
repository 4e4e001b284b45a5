"""Stage-9 probe: the power path is clean (probe8), so the selftest's
2.5e-2 must enter at the on-device MEL+LOG stage as compiled inside
log_mel_spectrogram. Variants, all on the bench's 4 selftest waves,
all vs the bench f64 oracle:

  full      log_mel_spectrogram as shipped (one jit)
  split     jit(stft_power_folded) committed, then jit(mel+log) on device
  hostmel   jit(stft_power_folded) committed, mel+log in host f64
  fullhlo   list of GEMM ops + precisions in the full path's HLO

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu9.py
"""

import json
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import importlib.util

import jax
import jax.numpy as jnp

spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules["benchmod"] = bench
spec.loader.exec_module(bench)

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import (MelConfig, log_mel_spectrogram,
                                         stft_power_folded)

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
    banks64 = np.asarray(banks).astype(np.float64)
    oracle = bench._mel_oracle_f64(waves, cfg, np.asarray(banks))

    out = {}

    jf = jax.jit(lambda w: log_mel_spectrogram(w, cfg))
    full = np.asarray(jf(w))
    out["full_max"] = float(np.abs(full - oracle).max())

    power = np.asarray(jax.jit(lambda w: stft_power_folded(
        w, cfg.n_fft, cfg.hopsize, cfg.win_length))(w))

    def mel_log(p):
        mel = jnp.einsum("mf,btf->bmt", banks, p,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return (jnp.log(mel + 1e-5) + 4.5) / 5.0

    split = np.asarray(jax.jit(mel_log)(jnp.asarray(power)))
    out["split_max"] = float(np.abs(split - oracle).max())

    hostmel = (np.log(np.einsum(
        "mf,btf->bmt", banks64, power.astype(np.float64)) + 1e-5) + 4.5) / 5.0
    out["hostmel_max"] = float(np.abs(hostmel - oracle).max())

    # where does the full path's max live, and what does split read there?
    err_full = np.abs(full - oracle)
    am = np.unravel_index(err_full.argmax(), err_full.shape)
    out["full_argmax_wave_mel_frame"] = [int(v) for v in am]
    out["at_argmax"] = {
        "oracle": float(oracle[am]), "full": float(full[am]),
        "split": float(split[am]), "hostmel": float(hostmel[am]),
    }

    hlo = jf.lower(w).compile().as_text()
    gemms = re.findall(
        r"= f32\[[^\]]*\]\{[^}]*\} (convolution|dot)\([^\n]*", hlo)
    precs = re.findall(r"(convolution|dot)\([^\n]*?operand_precision=\{"
                       r"(\w+),(\w+)\}", hlo)
    out["fullhlo_gemms"] = [f"{k}:{a},{b}" for k, a, b in precs]
    out["fullhlo_gemm_count"] = len(gemms)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
