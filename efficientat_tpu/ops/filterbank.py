"""Kaldi-style triangular mel filterbank, pure JAX.

Replicates the math of torchaudio ``compliance.kaldi.get_mel_banks`` as used
by the reference front-end (models/preprocess.py:52-55): HTK mel scale
``1127 * ln(1 + f/700)``, ``n_mels`` triangles spanning [fmin, fmax], weights
defined on the first ``n_fft/2`` FFT bins, with a zero column appended for
the Nyquist bin. No VTLN warping (the reference always passes
``vtln_warp_factor=1.0``).

``fmin``/``fmax`` may be traced JAX scalars: the reference jitters them per
training batch (models/preprocess.py:45-50), so the bank construction must
stay inside ``jit``. All shapes are static.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mel_scale(freq):
    return 1127.0 * jnp.log(1.0 + freq / 700.0)


def kaldi_mel_banks(n_mels: int, n_fft: int, sample_rate: int, fmin, fmax,
                    dtype=jnp.float32):
    """Triangular mel filterbank of shape ``(n_mels, n_fft // 2 + 1)``.

    The final (Nyquist) column is always zero, matching the reference's
    explicit zero-pad of the Kaldi bank (models/preprocess.py:54).
    """
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
