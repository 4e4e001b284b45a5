"""Fused Pallas TPU kernel for the log-mel front-end.

One kernel per (batch row, 128-frame tile) computes:
frame assembly -> windowed rDFT GEMM (MXU) -> power -> mel GEMM (MXU)
-> log -> (x+4.5)/5, with the windowed DFT basis resident in VMEM and the
frames tile never materialized in HBM (the XLA reference path materializes
a (B, frames, 1024) fp32 tensor — ~256 MB at batch 64).

Key layout tricks:
- The Nyquist FFT bin is dropped: the reference's Kaldi mel bank has an
  all-zero Nyquist column (models/preprocess.py:54), so only n_fft/2 = 512
  frequency bins contribute — making the DFT basis exactly (1024, 1024)
  (cos | sin) and the mel bank (512, n_mels): every GEMM dimension is a
  multiple of 128 (MXU-perfect, no lane padding waste).
- The waveform arrives pre-emphasized, reflect-padded, and laid out as
  128-sample rows that overlap by 64 (row m = samples [64m, 64m+128)); with
  hop % 64 == 0 every frame is 8 such rows at even 64-chunk offsets, so a
  frame tile is 8 static slices of a (rows, hop/64, 128) view — lane width
  is always 128 (Mosaic's tiling requirement; 64-wide lanes are rejected).
  Rows are DMA'd from HBM per tile (manual async copy; tile windows overlap
  so BlockSpec can't express them).

Supported configs: n_fft = 1024, hop % 64 == 0 (the default 320 and the
hop-20 variant 640). Other shapes fall back to the XLA GEMM path
(ops.melspec) automatically via ``log_mel_spectrogram(backend="auto")``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientat_tpu.ops.melspec import MelConfig, _dft_basis

FRAME_TILE = 128
LANE = 64  # samples per row of the chunked waveform layout


def pallas_supported(cfg: MelConfig) -> bool:
    return cfg.n_fft == 1024 and cfg.hopsize % LANE == 0


@functools.lru_cache(maxsize=8)
def _basis_no_nyquist(n_fft: int, win_length: int) -> np.ndarray:
    """(n_fft, n_fft) = [cos | sin] windowed basis, Nyquist bin dropped."""
    full = _dft_basis(n_fft, win_length)  # (n_fft, 2*(n_fft//2+1))
    n_freq = n_fft // 2 + 1
    cos = full[:, : n_freq - 1]
    sin = full[:, n_freq : 2 * n_freq - 1]
    return np.concatenate([cos, sin], axis=1)  # (1024, 1024)


def _mel_kernel(wave_ref, basis_ref, banks_ref, out_ref,
                *, hop_rows: int, n_parts: int, n_bins: int,
                scratch_rows: int, dft_precision):
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    rows_per_tile = FRAME_TILE * hop_rows

    window = wave_ref[0, pl.ds(t * rows_per_tile, scratch_rows), :]
    # rows are 128 samples overlapping by 64: frame i, part p lives at row
    # hop_rows*i + 2p -> (group, phase) = (i + 2p//hop_rows, 2p % hop_rows)
    view = window.reshape(scratch_rows // hop_rows, hop_rows, 2 * LANE)
    parts = [view[(2 * p // hop_rows):(2 * p // hop_rows) + FRAME_TILE,
                  (2 * p) % hop_rows, :]
             for p in range(n_parts)]
    frames = jnp.concatenate(parts, axis=1)  # (FRAME_TILE, n_fft)

    # dft_precision trades MXU passes for accuracy. The default single-pass
    # mode (bf16 operands) is catastrophic at spectral nulls (power ~ 0 from
    # cancellation) once the log is taken; HIGHEST (6-pass) is exact fp32.
    # "bf16x3" is a manual 3-pass scheme (Mosaic rejects Precision.HIGH):
    # split both operands into bf16 hi + lo halves (hi+lo reproduces ~16
    # mantissa bits) and drop only the lo*lo term — half the GEMM cost of
    # HIGHEST; accuracy quantified by scripts/bench_mel_precision.py.
    if dft_precision == "bf16x3":
        b32 = basis_ref[:]
        b_hi = b32.astype(jnp.bfloat16)
        b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_hi = frames.astype(jnp.bfloat16)
        f_lo = (frames - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        proj = dot(f_hi, b_hi) + (dot(f_hi, b_lo) + dot(f_lo, b_hi))
    else:
        proj = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                       precision=dft_precision)
    re = proj[:, :n_bins]
    im = proj[:, n_bins:]
    power = re * re + im * im  # (FRAME_TILE, n_bins)

    mel = jnp.dot(power, banks_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = (jnp.log(mel + 1e-5) + 4.5) / 5.0


def stft_log_mel_pallas(wave: jnp.ndarray, banks: jnp.ndarray,
                        cfg: MelConfig, dft_precision=None) -> jnp.ndarray:
    """Pre-emphasized-raw waveform (B, S) -> normalized log-mel (B, n_mels, frames).

    ``banks`` is the (n_mels, n_fft//2+1) Kaldi bank (possibly per-call
    jittered); its zero Nyquist column is dropped inside.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert pallas_supported(cfg), "unsupported mel config for the fused kernel"
    n_fft, hop = cfg.n_fft, cfg.hopsize
    hop_rows = hop // LANE          # 64-sample chunks per hop
    n_parts = n_fft // (2 * LANE)   # 128-wide parts per frame
    n_bins = n_fft // 2

    x = wave[:, 1:] - 0.97 * wave[:, :-1]  # pre-emphasis
    n_frames = x.shape[1] // hop + 1
    n_tiles = -(-n_frames // FRAME_TILE)

    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    # last row starts at chunk (n_tiles*128-1)*hop_rows + 2*(n_parts-1) and
    # spans 2 chunks; scratch windows are hop_rows-aligned
    max_parts_off = 2 * (n_parts - 1)
    scratch_rows = -(-(FRAME_TILE * hop_rows + max_parts_off) // hop_rows) * hop_rows
    rows_needed = n_tiles * FRAME_TILE * hop_rows + scratch_rows
    total = (rows_needed + 1) * LANE  # +1: rows are 128 wide over 64-chunks
    x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    chunks = x.reshape(x.shape[0], rows_needed + 1, LANE)
    # overlapping 128-wide rows: row m = [chunk m, chunk m+1]
    wave2d = jnp.concatenate([chunks[:, :-1], chunks[:, 1:]], axis=-1)

    basis = jnp.asarray(_basis_no_nyquist(n_fft, cfg.win_length))
    banks_t = jnp.transpose(banks[:, :n_bins], (1, 0)).astype(jnp.float32)

    b = wave2d.shape[0]
    if dft_precision is None:
        dft_precision = jax.lax.Precision.HIGHEST
    kernel = functools.partial(_mel_kernel, hop_rows=hop_rows,
                               n_parts=n_parts, n_bins=n_bins,
                               scratch_rows=scratch_rows,
                               dft_precision=dft_precision)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            # whole (padded) row track of one clip; the same block is
            # revisited for all frame tiles of a batch row, so Pallas
            # fetches it from HBM once per clip
            pl.BlockSpec((1, rows_needed, 2 * LANE), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, banks_t.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, banks_t.shape[1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * FRAME_TILE, banks_t.shape[1]),
                                       jnp.float32),
    )(wave2d, basis, banks_t)

    # (B, frames_padded, n_mels) -> (B, n_mels, n_frames)
    return jnp.transpose(out[:, :n_frames, :], (0, 2, 1))


def stft_log_mel_pallas_sharded(wave, banks, cfg: MelConfig, mesh,
                                axis: str = "data", dft_precision=None):
    """Fused kernel under a data-parallel mesh: shard_map over the batch.

    Each device runs the pallas kernel on its batch shard; the bank matrix
    is replicated. Batch must divide the mesh's ``axis`` size.
    """
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda w, b: stft_log_mel_pallas(w, b, cfg, dft_precision),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    return fn(wave, banks)


def log_mel_spectrogram_fused(
    waveform: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    backend: str = "auto",
    mesh=None,
    dft_precision=None,
) -> jnp.ndarray:
    """Drop-in for ops.melspec.log_mel_spectrogram with a fused-kernel path.

    backend: "pallas" (require the kernel), "xla" (reference GEMM path),
    "auto" (pallas when the config supports it and a TPU is present).
    Under a multi-device mesh pass ``mesh`` so the kernel is shard_mapped
    over the batch axis; without it, auto falls back to XLA on >1 device.

    dft_precision defaults to "bf16x3" (3-pass split-operand GEMM): within
    1e-3 max / 3.3e-4 p999 of the 6-pass fp32 HIGHEST on the normalized
    log-mel over adversarial signals (deep spectral nulls, silence) and
    ~1.25x faster end-to-end — far tighter than the reference's own
    fp16-autocast STFT (ex_audioset.py:304). Pass
    ``jax.lax.Precision.HIGHEST`` for bit-level parity work.
    """
    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.melspec import log_mel_spectrogram

    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_supported(cfg)
        and jax.default_backend() == "tpu"
        and (jax.device_count() == 1 or mesh is not None))
    if not use_pallas:
        return log_mel_spectrogram(waveform, cfg, training=training, rng=rng)

    if training and rng is None:
        raise ValueError("training=True requires an rng key")

    fmin = jnp.asarray(cfg.fmin, dtype=jnp.float32)
    fmax = jnp.asarray(cfg.effective_fmax, dtype=jnp.float32)
    if training:
        r_fmin, r_fmax, r_freqm, r_timem = jax.random.split(rng, 4)
        fmin = fmin + jax.random.randint(r_fmin, (), 0, cfg.fmin_aug_range).astype(jnp.float32)
        fmax = fmax + cfg.fmax_aug_range // 2 - jax.random.randint(
            r_fmax, (), 0, cfg.fmax_aug_range).astype(jnp.float32)
    banks = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, fmin, fmax)

    if dft_precision is None:
        dft_precision = "bf16x3"
    wave32 = waveform.astype(jnp.float32)
    if mesh is not None and len(mesh.devices.reshape(-1)) > 1:
        mel = stft_log_mel_pallas_sharded(wave32, banks, cfg, mesh,
                                          dft_precision=dft_precision)
    else:
        mel = stft_log_mel_pallas(wave32, banks, cfg, dft_precision)

    if training:
        # masks zero the *log-mel* then renormalize — post-kernel the values
        # are already (log+4.5)/5, so masked cells become (0+4.5)/5 = 0.9
        if cfg.freqm > 0:
            mel = _mask_with_value(mel, r_freqm, 1, cfg.freqm)
        if cfg.timem > 0:
            mel = _mask_with_value(mel, r_timem, 2, cfg.timem)
    return mel


def _mask_with_value(x, rng, axis, param, value=0.9):
    """SpecAugment on already-normalized output (fill = (0+4.5)/5)."""
    b = x.shape[0]
    d = x.shape[axis]
    r_w, r_s = jax.random.split(rng)
    width = jax.random.uniform(r_w, (b,)) * param
    start = jax.random.uniform(r_s, (b,)) * (d - width)
    pos = jnp.arange(d, dtype=jnp.float32)
    mask = (pos[None, :] >= start[:, None]) & (pos[None, :] < (start + width)[:, None])
    shape = [b, 1, 1]
    shape[axis] = d
    return jnp.where(mask.reshape(shape), value, x)
