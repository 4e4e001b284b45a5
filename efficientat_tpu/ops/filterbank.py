"""Kaldi-style triangular mel filterbank.

Replicates the math of torchaudio ``compliance.kaldi.get_mel_banks`` as used
by the reference front-end (models/preprocess.py:52-55): HTK mel scale
``1127 * ln(1 + f/700)``, ``n_mels`` triangles spanning [fmin, fmax], weights
defined on the first ``n_fft/2`` FFT bins, with a zero column appended for
the Nyquist bin. No VTLN warping (the reference always passes
``vtln_warp_factor=1.0``).

``fmin``/``fmax`` may be traced JAX scalars: the reference jitters them per
training batch (models/preprocess.py:45-50), so the bank construction must
stay inside ``jit`` for that path. When they are STATIC (every eval/serving
call), the banks are built host-side in float64 and embedded as constants:
constructing the triangle edges in on-device f32 costs ~1e-4 relative in
the edge weights, which the log near the 1e-5 mel floor amplifies to the
2.6e-3 "XLA path" deviation r4's bench selftest recorded — the error was
bank CONSTRUCTION, shared by every in-graph caller, not the STFT
arithmetic (r5 root-cause; see bench.py::mel_selftest).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _mel_scale(freq):
    return 1127.0 * jnp.log(1.0 + freq / 700.0)


@lru_cache(maxsize=64)
def _mel_banks_np(n_mels: int, n_fft: int, sample_rate: int,
                  fmin: float, fmax: float) -> np.ndarray:
    """Float64 host construction, cast to fp32 once at the end."""
    def mel(f):
        return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)

    num_fft_bins = n_fft // 2
    lo, hi = mel(fmin), mel(fmax)
    delta = (hi - lo) / (n_mels + 1)
    left = lo + np.arange(n_mels, dtype=np.float64)[:, None] * delta
    center = left + delta
    right = center + delta
    fft_mels = mel(sample_rate / n_fft * np.arange(num_fft_bins))[None, :]
    up = (fft_mels - left) / (center - left)
    down = (right - fft_mels) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return np.concatenate(
        [weights, np.zeros((n_mels, 1))], axis=1).astype(np.float32)


def kaldi_mel_banks(n_mels: int, n_fft: int, sample_rate: int, fmin, fmax,
                    dtype=jnp.float32):
    """Triangular mel filterbank of shape ``(n_mels, n_fft // 2 + 1)``.

    The final (Nyquist) column is always zero, matching the reference's
    explicit zero-pad of the Kaldi bank (models/preprocess.py:54).
    """
    if not (isinstance(fmin, jax.core.Tracer)
            or isinstance(fmax, jax.core.Tracer)):
        banks = _mel_banks_np(n_mels, n_fft, sample_rate,
                              float(fmin), float(fmax))
        return jnp.asarray(banks, dtype)

    # traced path (training-time fmin/fmax jitter): on-device f32
    num_fft_bins = n_fft // 2
    fft_bin_width = sample_rate / n_fft

    mel_low = _mel_scale(jnp.asarray(fmin, dtype=jnp.float32))
    mel_high = _mel_scale(jnp.asarray(fmax, dtype=jnp.float32))
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bins = jnp.arange(n_mels, dtype=jnp.float32)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    fft_mels = _mel_scale(fft_bin_width * jnp.arange(num_fft_bins, dtype=jnp.float32))[None, :]

    up_slope = (fft_mels - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - fft_mels) / (right_mel - center_mel)
    weights = jnp.maximum(0.0, jnp.minimum(up_slope, down_slope))

    nyquist_col = jnp.zeros((n_mels, 1), dtype=weights.dtype)
    return jnp.concatenate([weights, nyquist_col], axis=1).astype(dtype)
