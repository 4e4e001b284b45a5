"""Isolate the TPU-only deviation of the folded-basis XLA mel path.

On CPU the folded path tracks the f64 oracle to ~2.4e-5; the r5 bench
selftest on the v5e read 2.5e-2 — worse than the pre-fold 2.6e-3. This
probe decomposes the path per stage ON DEVICE to find which stage loses
the digits on the near-floor signal (rng.normal * 1e-3, the selftest's
worst case):

  A  stft_power_folded vs the f64 power oracle (pre-log, relative)
  B  the einsum alone: frames(f64->f32) @ folded_basis, HIGHEST, vs f64
  C  reference-order on-device: stft_power(preemphasis(x)) vs f64
  D  end-to-end log-mel XLA path vs f64 (the selftest's number)
  E  same einsum with jnp.dot general precision float32 vs HIGHEST

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_folded_tpu.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import (MelConfig, log_mel_spectrogram,
                                         preemphasis, stft_power,
                                         stft_power_folded,
                                         _folded_dft_basis, frame_signal)

SR = 32000


def f64_power_oracle(x, n_fft, hop, win):
    """Reference-order power STFT in float64 on the host.

    HISTORY: the first version of this oracle built a PERIODIC Hann
    (divide by ``win``) where the reference uses the symmetric window
    (divide by ``win - 1``) — a ~0.2% window error that probes 1-3
    misread as a 2e-2 TPU arithmetic deviation. probe6 re-ran against
    a correct oracle: the folded XLA path's interior is 4.0e-6. The
    real residual was on-device fp32 BANK construction (probe9)."""
    xe = x.astype(np.float64)
    xe = xe[:, 1:] - 0.97 * xe[:, :-1]
    pad = n_fft // 2
    xp = np.pad(xe, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xe.shape[1]) // hop + 1
    w = np.zeros(n_fft)
    left = (n_fft - win) // 2
    n = np.arange(win)
    w[left:left + win] = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))
    k = np.arange(n_fft // 2 + 1)
    ang = 2 * np.pi * k[None, :] * np.arange(n_fft)[:, None] / n_fft
    bc, bs = np.cos(ang) * w[:, None], np.sin(ang) * w[:, None]
    frames = np.stack([xp[:, f * hop:f * hop + n_fft]
                       for f in range(n_frames)], axis=1)
    re = frames @ bc
    im = frames @ bs
    return re ** 2 + im ** 2


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    waves = np.stack([
        rng.normal(size=t.size) * 1e-3,               # near-floor
        0.2 * np.sin(2 * np.pi * 95.5 * t) + 0.01 * rng.normal(size=t.size),
    ]).astype(np.float32)
    w = jnp.asarray(waves)
    out = {"platform": jax.devices()[0].platform,
           "device": jax.devices()[0].device_kind}

    oracle_p = f64_power_oracle(waves, cfg.n_fft, cfg.hopsize, cfg.win_length)

    # A: folded power vs oracle (relative, on bins above 1e-12)
    pf = np.asarray(jax.jit(lambda w: stft_power_folded(
        w, cfg.n_fft, cfg.hopsize, cfg.win_length))(w)).astype(np.float64)
    denom = np.maximum(oracle_p, 1e-10)
    out["A_folded_power_relerr"] = float(np.max(np.abs(pf - oracle_p) / denom))

    # C: reference-order power on device vs oracle
    pr = np.asarray(jax.jit(lambda w: stft_power(
        preemphasis(w), cfg.n_fft, cfg.hopsize,
        cfg.win_length))(w)).astype(np.float64)
    out["C_reforder_power_relerr"] = float(np.max(np.abs(pr - oracle_p) / denom))

    # B: einsum alone — frames built in f64 on host, cast f32, one matmul
    basis64 = None
    b32 = _folded_dft_basis(cfg.n_fft, cfg.win_length)
    pad = cfg.n_fft // 2
    xz = np.pad(waves.astype(np.float64), ((0, 0), (pad, pad)))
    n_frames = (waves.shape[1] - 1) // cfg.hopsize + 1
    fr64 = np.stack([xz[:, f * cfg.hopsize:f * cfg.hopsize + cfg.n_fft]
                     for f in range(n_frames)], axis=1)
    want_proj = fr64 @ b32.astype(np.float64)
    fr32 = jnp.asarray(fr64.astype(np.float32))
    for name, prec in (("B_einsum_HIGHEST", jax.lax.Precision.HIGHEST),
                       ("E_einsum_DEFAULT", jax.lax.Precision.DEFAULT)):
        got = np.asarray(jax.jit(lambda f: jnp.einsum(
            "btn,nk->btk", f, jnp.asarray(b32),
            preferred_element_type=jnp.float32,
            precision=prec))(fr32)).astype(np.float64)
        err = np.abs(got - want_proj)
        out[name + "_abserr"] = float(err.max())
        out[name + "_relerr_vs_framenorm"] = float(
            (err / np.maximum(np.abs(want_proj), 1e-8)).max())

    # D: end-to-end selftest number for context
    banks = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
                            cfg.effective_fmax)
    got = np.asarray(jax.jit(lambda w: log_mel_spectrogram(w, cfg))(w))
    mel64 = (np.log(np.asarray(banks).astype(np.float64)
                    @ oracle_p.transpose(0, 2, 1) + 1e-5) + 4.5) / 5.0
    out["D_logmel_abserr"] = float(np.max(np.abs(got - mel64)))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
