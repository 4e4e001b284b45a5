"""Stage-6 probe: reconcile probe3 (interior log-mel err 0.013) with
probe5 (power err 6e-7) and name the XLA-vs-Pallas 500x accuracy gap.

On the tonal wave (0.2 sin 95.5 Hz + 0.01 noise):

  1. pf_real  = jit(stft_power_folded)   — the shipping XLA path
     pf_reco  = jit(probe5 recomposition) — bitwise same? (settles
     whether probe3 and probe5 measured the same computation)
  2. errors vs TWO oracles:
       want32 = fr64 @ b32(f64)  — isolates GEMM arithmetic
       want64 = fr64 @ b64       — true folded-basis f64 (adds the
                                    f32 basis-cast contribution)
  3. log-mel-domain error maps (f64 banks) for pf_real vs each oracle,
     interior only — which term carries probe3's 0.013?
  4. dot2d variant: frames reshaped (B*T, n_fft) through jnp.dot
     HIGHEST (dot lowering, not einsum->conv) — does it close the gap?
  5. pallas HIGHEST log-mel on the same wave vs the same f64 pipeline —
     the 2.86e-5 reference point, recomputed here for apples-to-apples.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu6.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import (MelConfig, _folded_dft_basis,
                                         frame_signal, hann_window,
                                         stft_power_folded)

SR = 32000
N_FFT, HOP, WIN = 1024, 320, 800
PAD = N_FFT // 2


def folded_basis_f64(n_fft, win_length, coef=0.97):
    n_freq = n_fft // 2 + 1
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = hann_window(win_length)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(ang) * w[:, None],
                            np.sin(ang) * w[:, None]], axis=1)
    shifted = np.vstack([np.zeros((1, basis.shape[1])), basis[:-1]])
    return shifted - coef * basis


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    wave = (0.2 * np.sin(2 * np.pi * 95.5 * t)
            + 0.01 * rng.normal(size=t.size)).astype(np.float32)[None]
    w = jnp.asarray(wave)
    len_xe = wave.shape[1] - 1
    n_frames = len_xe // HOP + 1
    n_freq = N_FFT // 2 + 1

    b64 = folded_basis_f64(N_FFT, WIN)
    b32 = _folded_dft_basis(N_FFT, WIN)

    xz = np.pad(wave.astype(np.float64), ((0, 0), (PAD, PAD)))
    fr64 = np.stack([xz[:, f * HOP:f * HOP + N_FFT]
                     for f in range(n_frames)], axis=1)
    p32 = fr64 @ b32.astype(np.float64)
    want32 = p32[..., :n_freq] ** 2 + p32[..., n_freq:] ** 2
    p64 = fr64 @ b64
    want64 = p64[..., :n_freq] ** 2 + p64[..., n_freq:] ** 2

    pf_real = np.asarray(jax.jit(lambda x: stft_power_folded(
        x, N_FFT, HOP, WIN))(w)).astype(np.float64)

    # probe5's recomposition, power-only (no edge patch for simplicity;
    # interior-only comparisons below)
    def reco(x):
        frames = frame_signal(x, N_FFT, HOP, n_frames, pad_mode="constant")
        proj = jnp.einsum("btn,nk->btk", frames, jnp.asarray(b32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2

    pf_reco = np.asarray(jax.jit(reco)(w)).astype(np.float64)

    def dot2d(x):
        frames = frame_signal(x, N_FFT, HOP, n_frames, pad_mode="constant")
        f2 = frames.reshape(-1, N_FFT)
        proj = jnp.dot(f2, jnp.asarray(b32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        proj = proj.reshape(frames.shape[0], n_frames, -1)
        return proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2

    pf_dot = np.asarray(jax.jit(dot2d)(w)).astype(np.float64)

    out = {
        "real_vs_reco_interior_max": float(
            np.abs(pf_real[:, 2:-1] - pf_reco[:, 2:-1]).max()),
        "real_vs_want32_interior": float(
            np.abs(pf_real[:, 2:-1] - want32[:, 2:-1]).max()),
        "real_vs_want64_interior": float(
            np.abs(pf_real[:, 2:-1] - want64[:, 2:-1]).max()),
        "cast_only_interior": float(
            np.abs(want32[:, 2:-1] - want64[:, 2:-1]).max()),
        "dot2d_vs_want64_interior": float(
            np.abs(pf_dot[:, 2:-1] - want64[:, 2:-1]).max()),
    }

    # log-mel domain, interior frames only, f64 banks on both sides
    banks = np.asarray(kaldi_mel_banks(
        cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
        cfg.effective_fmax)).astype(np.float64)

    def logmel(p):
        return (np.log(np.einsum("mf,btf->bmt", banks, p) + 1e-5) + 4.5) / 5.0

    lm64 = logmel(want64)
    for name, p in (("real", pf_real), ("reco", pf_reco), ("dot2d", pf_dot),
                    ("want32", want32)):
        err = np.abs(logmel(p) - lm64)[0][:, 2:-1]
        am = np.unravel_index(err.argmax(), err.shape)
        out[f"lm_{name}_interior_max"] = float(err.max())
        out[f"lm_{name}_argmax_mel_frame"] = [int(am[0]), int(am[1]) + 2]
    print(json.dumps(out, indent=1), flush=True)

    # 5. pallas HIGHEST on the same wave, same f64 pipeline
    if jax.devices()[0].platform == "tpu":
        from efficientat_tpu.ops.mel_pallas import stft_log_mel_pallas
        banks32 = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
                                  cfg.effective_fmax)
        pl_lm = np.asarray(jax.jit(lambda x: stft_log_mel_pallas(
            x, banks32, cfg, jax.lax.Precision.HIGHEST))(w))
        lm64b = (np.log(np.einsum("mf,btf->bmt", banks, want64) + 1e-5)
                 + 4.5) / 5.0
        err = np.abs(pl_lm - lm64b)[0][:, 2:-1]
        am = np.unravel_index(err.argmax(), err.shape)
        out2 = {"lm_pallas_interior_max": float(err.max()),
                "lm_pallas_argmax_mel_frame": [int(am[0]), int(am[1]) + 2]}
        print(json.dumps(out2, indent=1), flush=True)


if __name__ == "__main__":
    main()
