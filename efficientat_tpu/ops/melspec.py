"""Log-mel spectrogram front-end, formulated TPU-first as MXU GEMMs.

Reference behavior (models/preprocess.py:6-67, ``AugmentMelSTFT``):

1. pre-emphasis: valid conv with taps ``[-0.97, 1]``           (:30,41)
2. STFT: n_fft=1024, hop=320, win=800, periodic=False Hann,
   center=True (reflect pad), power spectrum re^2+im^2          (:22-24,42-44)
3. Kaldi mel bank, 128 bands; during training fmin/fmax are
   jittered per call: fmin += U{0..fmin_aug_range-1},
   fmax += fmax_aug_range//2 - U{0..fmax_aug_range-1}           (:45-55)
4. mel matmul in fp32, then log(mel + 1e-5)                     (:56-59)
5. SpecAugment (training only): frequency mask (param 48) then
   time mask (param 192), iid per batch element, fill 0.0       (:31-38,61-63)
6. fixed normalization (x + 4.5) / 5                            (:65)

TPU design: instead of an FFT, each frame is multiplied by a precomputed
windowed rDFT basis — one ``(frames, n_fft) x (n_fft, 2*(n_fft/2+1))`` GEMM
per batch — followed by a ``(n_mels, n_freq)`` mel GEMM. Both map directly
onto the MXU; frame extraction is a handful of strided slices (no gather).
Everything here is shape-static and jit-friendly; the fmin/fmax jitter uses
explicit JAX PRNG keys so it stays inside the compiled step.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientat_tpu.ops.filterbank import kaldi_mel_banks


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Front-end configuration (defaults mirror models/preprocess.py:7)."""

    n_mels: int = 128
    sr: int = 32000
    win_length: int = 800
    hopsize: int = 320
    n_fft: int = 1024
    freqm: int = 48
    timem: int = 192
    fmin: float = 0.0
    fmax: Optional[float] = None
    fmin_aug_range: int = 10
    fmax_aug_range: int = 2000

    def __post_init__(self):
        assert self.fmin_aug_range >= 1, "fmin_aug_range must be >= 1 (1 == no augmentation)"
        assert self.fmax_aug_range >= 1, "fmax_aug_range must be >= 1 (1 == no augmentation)"

    @property
    def effective_fmax(self) -> float:
        # models/preprocess.py:17-19 — None means "Nyquist minus half the jitter range".
        if self.fmax is None:
            return float(self.sr // 2 - self.fmax_aug_range // 2)
        return float(self.fmax)

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """Frames produced for a waveform of ``num_samples`` samples.

        Pre-emphasis shortens by 1; centered STFT yields 1 + L // hop frames.
        (A 10 s / 320 kHz-sample clip gives exactly 1000 frames.)
        """
        return (num_samples - 1) // self.hopsize + 1


def hann_window(win_length: int) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, float64."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (win_length - 1)))


@lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed rDFT basis, shape (n_fft, 2 * (n_fft//2 + 1)).

    Column k is cos(2*pi*k*n/n_fft) * w[n]; columns n_freq..2*n_freq-1 hold
    the sin part. The window (length ``win_length``) is zero-padded centered
    in the n_fft frame, matching torch.stft's handling of win < n_fft.
    Built in float64 so basis phases are accurate, then cast to fp32.
    """
    n_freq = n_fft // 2 + 1
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = hann_window(win_length)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(ang) * w[:, None], np.sin(ang) * w[:, None]], axis=1)
    return basis.astype(np.float32)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, n_frames: int,
                 pad_mode: str = "reflect") -> jnp.ndarray:
    """Extract centered frames: (B, L) -> (B, n_frames, n_fft).

    ``pad_mode="reflect"`` matches torch.stft center=True; the folded-basis
    path uses ``"constant"`` (zero pad) and patches the edge frames exactly.
    Uses a chunked strided-slice decomposition (chunk = gcd(hop, n_fft)) so
    no gather is emitted: the padded signal is reshaped into rows of
    ``chunk`` samples and each of the ``n_fft/chunk`` frame sub-blocks is a
    single strided slice.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    chunk = math.gcd(hop, n_fft)
    if chunk >= 16:
        b, lp = x.shape
        rows_needed = (n_frames - 1) * (hop // chunk) + n_fft // chunk
        rows_avail = -(-lp // chunk)
        rows = max(rows_needed, rows_avail)
        x = jnp.pad(x, ((0, 0), (0, rows * chunk - lp)))
        chunks = x.reshape(b, rows, chunk)
        hop_c, win_c = hop // chunk, n_fft // chunk
        segs = [
            jax.lax.slice_in_dim(chunks, j, j + hop_c * (n_frames - 1) + 1, hop_c, axis=1)
            for j in range(win_c)
        ]
        return jnp.concatenate(segs, axis=2)
    # Fallback for pathological hop sizes: explicit gather.
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def stft_power(x: jnp.ndarray, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """Power spectrogram |STFT|^2: (B, L) -> (B, n_frames, n_fft//2+1).

    One MXU GEMM against the precomputed windowed rDFT basis.
    """
    n_frames = x.shape[1] // hop + 1
    frames = frame_signal(x, n_fft, hop, n_frames)
    basis = jnp.asarray(_dft_basis(n_fft, win_length))
    # Precision.HIGHEST: true fp32 multiplies on TPU (the MXU's default
    # single-pass mode truncates operands to bf16; the reference's fp32
    # mel pipeline parity requires full precision here)
    proj = jnp.einsum("btn,nk->btk", frames, basis,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_freq = n_fft // 2 + 1
    re, im = proj[..., :n_freq], proj[..., n_freq:]
    return re * re + im * im


def preemphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """Valid-mode pre-emphasis filter: y[t] = x[t+1] - coef * x[t]."""
    return x[:, 1:] - coef * x[:, :-1]


@lru_cache(maxsize=8)
def _folded_dft_basis(n_fft: int, win_length: int,
                      coef: float = 0.97) -> np.ndarray:
    """Pre-emphasis-folded windowed rDFT basis (n_fft, 2*(n_fft//2+1)).

    For xe[t] = x[t+1] - coef*x[t] and a windowed basis b whose centered
    window is zero at the frame edges (win_length < n_fft),
    ``sum_m b[m,k]*xe[s+m] == sum_j B'[j,k]*x[s+j]`` with
    ``B'[j,k] = b[j-1,k] - coef*b[j,k]`` (b[-1] := 0) — the boundary terms
    vanish with the window. Built in float64 (the mel_pallas kernel proves
    the fold: computing the difference signal in fp32 first loses ~4
    digits on smooth audio, which log near the 1e-5 mel floor turns into
    the r4 selftest's 2.6e-3 XLA-path deviation)."""
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
    return (shifted - coef * basis).astype(np.float32)


def _edge_power(x_raw: jnp.ndarray, n_fft: int, hop: int, win_length: int,
                left_f, right_f, coef: float = 0.97) -> jnp.ndarray:
    """Exact reference-math power rows for the frames whose window overlaps
    the reflect-pad region (the one place the folded-basis frames — which
    see a zero pad — differ). Pre-emphasis + reflect pad + unfolded basis
    on short slivers; <= a handful of frames per clip."""
    pad = n_fft // 2
    seg = 2 * n_fft
    frames = []
    if left_f:
        s = x_raw[:, :seg]
        xe = s[:, 1:] - coef * s[:, :-1]
        xep = jnp.pad(xe, ((0, 0), (pad, 0)), mode="reflect")
        for f in left_f:
            frames.append(xep[:, f * hop: f * hop + n_fft])
    if right_f:
        s = x_raw[:, -seg:]
        xe = s[:, 1:] - coef * s[:, :-1]
        xep = jnp.pad(xe, ((0, 0), (0, pad)), mode="reflect")
        base = x_raw.shape[1] - seg  # xe here starts at global xe index base
        for f in right_f:
            off = f * hop - pad - base
            frames.append(xep[:, off: off + n_fft])
    fr = jnp.stack(frames, axis=1)  # (B, n_edge, n_fft)
    basis = jnp.asarray(_dft_basis(n_fft, win_length))
    proj = jnp.einsum("ben,nk->bek", fr, basis,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_freq = n_fft // 2 + 1
    return proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2


def stft_power_folded(x_raw: jnp.ndarray, n_fft: int, hop: int,
                      win_length: int, coef: float = 0.97) -> jnp.ndarray:
    """Power spectrogram of ``preemphasis(x_raw)`` WITHOUT materializing
    the cancellation-prone difference signal: frames of the RAW waveform
    against the folded basis (``_folded_dft_basis``), with the few
    reflect-pad edge frames patched by the exact reference math.

    (B, L) raw samples -> (B, (L-1)//hop + 1, n_fft//2+1). Identical math
    to ``stft_power(preemphasis(x))`` in exact arithmetic; in fp32 it is
    ~2 orders of magnitude closer to the float64 truth on smooth audio
    (the mel_pallas fold, applied to the XLA fallback so every hop/mel
    variant gets the accuracy, not just the kernel-supported configs)."""
    len_xe = x_raw.shape[1] - 1
    n_frames = len_xe // hop + 1
    pad = n_fft // 2
    frames = frame_signal(x_raw, n_fft, hop, n_frames, pad_mode="constant")
    basis = jnp.asarray(_folded_dft_basis(n_fft, win_length, coef))
    proj = jnp.einsum("btn,nk->btk", frames, basis,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_freq = n_fft // 2 + 1
    power = proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2

    left_f = [f for f in range(n_frames) if f * hop < pad]
    right_f = [f for f in range(n_frames) if f * hop + pad > len_xe]
    if left_f or right_f:
        edge = _edge_power(x_raw, n_fft, hop, win_length, left_f, right_f,
                           coef)
        nl = len(left_f)
        if left_f:
            power = jax.lax.dynamic_update_slice(power, edge[:, :nl],
                                                 (0, 0, 0))
        if right_f:
            power = jax.lax.dynamic_update_slice(power, edge[:, nl:],
                                                 (0, right_f[0], 0))
    return power


def _mask_axis(x: jnp.ndarray, rng: jax.Array, axis: int, mask_param: int) -> jnp.ndarray:
    """SpecAugment mask along ``axis`` of (B, F, T), iid per batch element.

    Matches torchaudio ``_mask_along_axis_iid``: width ~ U[0, P) (float),
    start ~ U[0, D - width), mask [start, start+width), fill 0.0.
    """
    b = x.shape[0]
    d = x.shape[axis]
    r_width, r_start = jax.random.split(rng)
    width = jax.random.uniform(r_width, (b,)) * mask_param
    start = jax.random.uniform(r_start, (b,)) * (d - width)
    pos = jnp.arange(d, dtype=jnp.float32)
    mask = (pos[None, :] >= start[:, None]) & (pos[None, :] < (start + width)[:, None])
    shape = [b, 1, 1]
    shape[axis] = d
    return jnp.where(mask.reshape(shape), 0.0, x)


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Waveform (B, num_samples) float32 -> normalized log-mel (B, n_mels, n_frames).

    ``training=True`` enables the fmin/fmax filterbank jitter and SpecAugment
    masking and requires ``rng``. The mel matmul runs in fp32 regardless of
    any surrounding precision policy (reference keeps it fp32 under autocast,
    models/preprocess.py:56-57).
    """
    if training and rng is None:
        raise ValueError("training=True requires an rng key")

    x32 = waveform.astype(jnp.float32)
    if x32.shape[1] >= 2 * cfg.n_fft:
        # folded-basis path: no fp32 pre-emphasis cancellation (see
        # stft_power_folded) — works for EVERY hop/n_mels config
        spec = stft_power_folded(x32, cfg.n_fft, cfg.hopsize, cfg.win_length)
    else:
        # clips shorter than the edge-patch slivers: reference-order math
        x = preemphasis(x32)
        spec = stft_power(x, cfg.n_fft, cfg.hopsize, cfg.win_length)

    # Keep fmin/fmax as PYTHON floats unless the training jitter makes them
    # data-dependent: under jit even ``jnp.asarray(0.0)`` is a Tracer (JAX
    # stages constants), and a traced fmin forces kaldi_mel_banks onto its
    # on-device fp32 construction path — whose triangle-edge rounding is the
    # 2.5e-2 near-floor selftest deviation the host-f64 banks exist to avoid
    # (root-caused on a v5e, scripts/probe_folded_tpu9.py).
    fmin, fmax = cfg.fmin, cfg.effective_fmax
    if training:
        r_fmin, r_fmax, r_freqm, r_timem = jax.random.split(rng, 4)
        fmin = jnp.asarray(fmin, jnp.float32) + jax.random.randint(
            r_fmin, (), 0, cfg.fmin_aug_range).astype(jnp.float32)
        fmax = jnp.asarray(fmax, jnp.float32) + (
            cfg.fmax_aug_range // 2 - jax.random.randint(
                r_fmax, (), 0, cfg.fmax_aug_range)).astype(jnp.float32)

    banks = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, fmin, fmax)
    mel = jnp.einsum("mf,btf->bmt", banks, spec,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(mel + 1e-5)

    if training:
        if cfg.freqm > 0:
            mel = _mask_axis(mel, r_freqm, axis=1, mask_param=cfg.freqm)
        if cfg.timem > 0:
            mel = _mask_axis(mel, r_timem, axis=2, mask_param=cfg.timem)

    return (mel + 4.5) / 5.0
