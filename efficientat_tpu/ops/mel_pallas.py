"""Fused Pallas TPU kernel for the log-mel front-end.

One kernel per (batch row, 128-frame tile) computes:
frame assembly -> windowed rDFT GEMM (MXU) -> power -> mel GEMM (MXU)
-> log -> (x+4.5)/5, with the windowed DFT basis resident in VMEM and the
frames tile never materialized in HBM (the XLA reference path materializes
a (B, frames, 1024) fp32 tensor — ~256 MB at batch 64).

Key design points (each one measured, scripts/probe_mel_kernel.py):

- **Pre-emphasis is folded into the DFT basis.** The reference applies
  ``xe[t] = x[t+1] - 0.97*x[t]`` to the waveform before the STFT
  (models/preprocess.py:30,41). Because the Hann window is zero at the
  frame edges, the windowed DFT of the pre-emphasized signal equals a
  plain dot of the *raw* signal with a folded basis
  ``B'[j,k] = b[j-1,k] - 0.97*b[j,k]`` (b[-1] := 0). This removes both
  the pre-emphasis op (misaligned-by-one lane slices, ~2.4 ms/batch-64 in
  XLA) and the reflect pad (~1.3 ms) from the XLA prep — only a constant
  pad remains — and is also ~19x *more accurate* under the bf16x3 GEMM
  (7e-5 vs 1.4e-3 max) because the pre-emphasis subtraction no longer
  cancels in bf16. The few frames per clip whose window overlaps the
  reflect-pad region are recomputed exactly in XLA on 2048-sample slivers
  and patched into the output.
  On real audio the fold helps the fp32 path too: smooth low-frequency
  content makes xe tiny relative to x, so computing the subtraction on
  the waveform in fp32 (as the torch reference does) loses ~4 digits.
  Since r5 the XLA fallback rides the same folded basis AND host-f64
  bank construction (ops/melspec.py::stft_power_folded; a traced fmin
  used to switch banks to on-device fp32 — probe_folded_tpu9), so both
  paths track the float64 truth to ~2.9e-5 on the bench selftest waves.
- The Nyquist FFT bin is dropped: the reference's Kaldi mel bank has an
  all-zero Nyquist row (models/preprocess.py:54), so only n_fft/2 = 512
  frequency bins contribute — making the DFT basis exactly (1024, 1024)
  (cos | sin) and every GEMM dimension a multiple of 128 (MXU-perfect).
- **Frame assembly from the undoubled (G, 5, 128) waveform view.** With
  hop=320, frames at even index start lane-aligned every 5 chunks of 128
  samples and odd frames sit at a 64-lane offset; the kernel assembles a
  128-frame tile as 64 even frames (8 aligned slices) + 64 odd frames
  (8 slice-pairs lane-stitched at offset 64) and un-interleaves the mel
  rows at the end. This avoids materializing the 2x-overlapped row
  layout in HBM that the previous kernel needed (~1.2 ms/batch-64).
  With hop=640 every frame is lane-aligned and the parity split
  disappears.

Supported configs: n_fft = 1024 and hop in {320, 640} (the default and
the hop-20 variant). Other shapes fall back to the XLA GEMM path
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
GROUP = 640  # samples per group row-block (5 chunks of 128)
PREEMPH = 0.97


def pallas_supported(cfg: MelConfig) -> bool:
    return cfg.n_fft == 1024 and cfg.hopsize in (320, 640)


@functools.lru_cache(maxsize=8)
def _basis_no_nyquist(n_fft: int, win_length: int) -> np.ndarray:
    """(n_fft, n_fft) = [cos | sin] windowed basis, Nyquist bin dropped."""
    full = _dft_basis(n_fft, win_length)  # (n_fft, 2*(n_fft//2+1))
    n_freq = n_fft // 2 + 1
    cos = full[:, : n_freq - 1]
    sin = full[:, n_freq : 2 * n_freq - 1]
    return np.concatenate([cos, sin], axis=1)  # (1024, 1024)


@functools.lru_cache(maxsize=8)
def _folded_basis_no_nyquist(n_fft: int, win_length: int,
                             coef: float = PREEMPH) -> np.ndarray:
    """Pre-emphasis-folded windowed rDFT basis, built in float64.

    For xe[t] = x[t+1] - coef*x[t] and a windowed basis b[m,k] whose
    window is zero at m=0 and m=n_fft-1 (win_length < n_fft, centered),
    sum_m b[m,k]*xe[q+m] == sum_j B'[j,k]*x[q+j] with
    B'[j,k] = b[j-1,k] - coef*b[j,k] (b[-1] := 0): substituting the
    pre-emphasis and re-indexing, the two boundary terms carry a factor
    b[0,k] = b[n_fft-1,k] = 0.
    """
    from efficientat_tpu.ops.melspec import hann_window

    n_freq = n_fft // 2 + 1
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = hann_window(win_length)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(ang) * w[:, None],
                            np.sin(ang) * w[:, None]], axis=1)
    basis = np.concatenate([basis[:, : n_freq - 1],
                            basis[:, n_freq: 2 * n_freq - 1]], axis=1)
    shifted = np.vstack([np.zeros((1, basis.shape[1])), basis[:-1]])
    return (shifted - coef * basis).astype(np.float32)


def _mel_kernel(wave_ref, *refs, parity: int, n_bins: int, bf16x3: bool,
                g_raw: int, dft_precision=None):
    """Assemble one 128-frame tile from the staged (G, 5, 128) track and
    compute its normalized log-mel rows.

    The raw, UNPADDED wave track of one clip lives in HBM (``wave_ref``,
    (B, g_raw, 5, 128), memory_space=ANY). It is DMA'd once per clip into
    double-buffered VMEM scratch at a one-group offset (the left "pad"),
    with the scratch edges zeroed on first touch; clip bi+1's copy is
    started at clip bi's first tile so the DMA overlaps compute. This
    replaces the XLA-side pad copy (~0.8 ms/batch-64) with a ~1.3 MB
    contiguous DMA per clip (7.3 -> 4.0 ms total for the mel at B=64
    across the folded-basis + undoubled-view + DMA-staging changes).

    Frame i's part q (128 samples) starts at raw sample
    320*i - 512 + 128*q + 640 (the +640 is the one-group scratch offset),
    i.e. chunk 5*(i/2) + 1 + q for even i — an aligned slice — and chunk
    5*(i-1)/2 + 3 + q with a 64-lane offset for odd i.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if bf16x3:
        bhi_ref, blo_ref, banks_ref, out_ref, v_ref, sem = refs
    else:
        b32_ref, banks_ref, out_ref, v_ref, sem = refs

    bi = pl.program_id(0)
    t = pl.program_id(1)
    nb = pl.num_programs(0)
    g_need = v_ref.shape[1]

    def _stage(clip, slot):
        return pltpu.make_async_copy(wave_ref.at[clip],
                                     v_ref.at[slot, pl.ds(1, g_raw)],
                                     sem.at[slot])

    @pl.when(jnp.logical_and(bi == 0, t == 0))
    def _first_clip():
        # zero the pad edges of both slots once; they are never overwritten
        for s in range(2):
            v_ref[s, 0] = jnp.zeros_like(v_ref[s, 0])
            if g_need - 1 - g_raw > 0:
                v_ref[s, pl.ds(1 + g_raw, g_need - 1 - g_raw)] = jnp.zeros(
                    (g_need - 1 - g_raw, 5, 128), v_ref.dtype)
        _stage(0, 0).start()

    @pl.when(t == 0)
    def _rotate_buffers():
        # clip bi's track was started earlier (or just above); wait for it,
        # then prefetch clip bi+1 into the other slot so its DMA overlaps
        # this clip's tiles
        _stage(bi, bi % 2).wait()

        @pl.when(bi + 1 < nb)
        def _prefetch_next():
            _stage(bi + 1, (bi + 1) % 2).start()

    slot = bi % 2
    rows = FRAME_TILE // parity
    jt = t * rows
    ev = [v_ref[slot, pl.ds(jt + (q + 1) // 5, rows), (q + 1) % 5, :]
          for q in range(8)]
    frames = jnp.concatenate(ev, axis=1)  # (rows, 1024)
    if parity == 2:
        od = []
        for q in range(8):
            a = v_ref[slot, pl.ds(jt + (3 + q) // 5, rows), (3 + q) % 5, :]
            b = v_ref[slot, pl.ds(jt + (4 + q) // 5, rows), (4 + q) % 5, :]
            od.append(jnp.concatenate([a[:, 64:], b[:, :64]], axis=1))
        frames = jnp.concatenate([frames, jnp.concatenate(od, axis=1)],
                                 axis=0)  # (128, 1024) [evens; odds]

    # bf16x3: 3-pass split-operand GEMM (hi+lo reproduces ~16 mantissa
    # bits; the lo*lo term is dropped) — half the MXU cost of the 6-pass
    # fp32 HIGHEST at 7e-5 max deviation (scripts/bench_mel_precision.py).
    if bf16x3:
        fh = frames.astype(jnp.bfloat16)
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        proj = dot(fh, bhi_ref[:]) + (dot(fh, blo_ref[:]) + dot(fl, bhi_ref[:]))
    else:
        proj = jnp.dot(frames, b32_ref[:], preferred_element_type=jnp.float32,
                       precision=dft_precision)
    re = proj[:, :n_bins]
    im = proj[:, n_bins:]
    power = re * re + im * im

    mel = jnp.dot(power, banks_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    m = (jnp.log(mel + 1e-5) + 4.5) / 5.0
    if parity == 2:
        # un-interleave [evens; odds] back to frame order
        m = jnp.stack([m[:rows], m[rows:]], axis=1).reshape(FRAME_TILE, -1)
    out_ref[0] = m


def _edge_frames_logmel(wave, banks_t, cfg: MelConfig, left_f, right_f):
    """Exact (fp32 HIGHEST) log-mel rows for the frames whose window
    touches the reflect-pad region — the one place where the folded-basis
    kernel (which sees a zero pad) differs from the reference math.
    Computed on 2048-sample slivers; cost is negligible (<=4 frames/clip).
    """
    n_fft, hop = cfg.n_fft, cfg.hopsize
    pad = n_fft // 2
    seg = 2048
    frames = []
    if left_f:
        s = wave[:, :seg]
        xe = s[:, 1:] - PREEMPH * s[:, :-1]
        xep = jnp.pad(xe, ((0, 0), (pad, 0)), mode="reflect")
        for f in left_f:
            frames.append(xep[:, f * hop: f * hop + n_fft])
    if right_f:
        s = wave[:, -seg:]
        xe = s[:, 1:] - PREEMPH * s[:, :-1]
        xep = jnp.pad(xe, ((0, 0), (0, pad)), mode="reflect")
        base = wave.shape[1] - seg  # xe here starts at global xe index `base`
        for f in right_f:
            off = f * hop - pad - base
            frames.append(xep[:, off: off + n_fft])
    fr = jnp.stack(frames, axis=1)  # (B, n_edge, n_fft)
    basis = jnp.asarray(_basis_no_nyquist(n_fft, cfg.win_length))
    proj = jnp.einsum("ben,nk->bek", fr, basis,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    n_bins = n_fft // 2
    power = proj[..., :n_bins] ** 2 + proj[..., n_bins:] ** 2
    mel = jnp.dot(power, banks_t, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return (jnp.log(mel + 1e-5) + 4.5) / 5.0


def stft_log_mel_pallas(wave: jnp.ndarray, banks: jnp.ndarray,
                        cfg: MelConfig, dft_precision=None) -> jnp.ndarray:
    """Raw waveform (B, S) -> normalized log-mel (B, n_mels, frames).

    Pre-emphasis, window, rDFT, power, mel, log and normalization are all
    inside the kernel (pre-emphasis via the folded basis). ``banks`` is
    the (n_mels, n_fft//2+1) Kaldi bank (possibly per-call jittered); its
    zero Nyquist row is dropped inside.

    ``dft_precision``: ``"bf16x3"`` (3-pass split-operand GEMM, default
    for serving) or ``jax.lax.Precision.HIGHEST`` (exact fp32, default
    here for parity work).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert pallas_supported(cfg), "unsupported mel config for the fused kernel"
    # the edge-frame patch slices wave[:, -2048:] (needs S >= 2*n_fft) and
    # the per-clip VMEM track scratch caps the upper end — same range the
    # backend="auto" gate enforces; a direct call must not bypass it
    assert 4096 <= wave.shape[1] <= 1_000_000, (
        f"fused mel supports 4096..1_000_000 samples, got {wave.shape[1]}")
    n_fft, hop = cfg.n_fft, cfg.hopsize
    n_bins = n_fft // 2
    pad = n_fft // 2
    parity = 2 if hop == 320 else 1
    rows = FRAME_TILE // parity

    len_xe = wave.shape[1] - 1
    n_frames = len_xe // hop + 1
    n_tiles = -(-n_frames // FRAME_TILE)
    g_need = rows * n_tiles + 2
    # whole-second 32 kHz clips divide evenly into 640-sample groups; only
    # odd lengths pay an XLA pad (the kernel stages the track itself).
    # ``wave`` itself stays unpadded — the edge-frame patch below needs the
    # true signal end for its reflect pad.
    #
    # Known floor: the 4D reshape below is a physical retiling copy at the
    # pallas boundary (~0.9 ms/batch-64; XLA tiles (B, S) as 8 batch rows x
    # 128 samples, the custom call wants default layout on (B, g, 5, 128),
    # and the 5-sublane dim pads 8/5). Feeding the natural (B, S) layout
    # and reshaping the DMA source ref in-kernel fails today: Mosaic
    # requires tile-aligned memref slices, and selecting one clip from the
    # batch-tiled layout is sub-tile (measured/attempted 2026-08; revisit
    # if ref-reshape over batch-tiled HBM lands in Mosaic).
    wpad = wave
    if wpad.shape[1] % GROUP:
        wpad = jnp.pad(wpad, ((0, 0), (0, GROUP - wpad.shape[1] % GROUP)))
    g_raw = min(wpad.shape[1] // GROUP, g_need - 1)
    v = wpad[:, :g_raw * GROUP].reshape(wpad.shape[0], g_raw, 5, 128)

    if dft_precision is None:
        dft_precision = jax.lax.Precision.HIGHEST
    bf16x3 = dft_precision == "bf16x3"
    basis_np = _folded_basis_no_nyquist(n_fft, cfg.win_length)
    if bf16x3:
        bhi_np = basis_np.astype(np.float32).astype(jnp.bfloat16)
        ops = [jnp.asarray(bhi_np),
               jnp.asarray((basis_np - np.asarray(bhi_np, np.float32))
                           .astype(jnp.bfloat16))]
    else:
        ops = [jnp.asarray(basis_np)]
    banks_t = jnp.transpose(banks[:, :n_bins], (1, 0)).astype(jnp.float32)

    b = v.shape[0]
    kernel = functools.partial(_mel_kernel, parity=parity, n_bins=n_bins,
                               bf16x3=bf16x3, g_raw=g_raw,
                               dft_precision=dft_precision)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            # raw unpadded track, whole array in HBM; the kernel DMAs one
            # clip's track into VMEM scratch at the clip's first tile
            pl.BlockSpec(memory_space=pl.ANY),
            *[pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM) for _ in ops],
            pl.BlockSpec((n_bins, banks_t.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, banks_t.shape[1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * FRAME_TILE, banks_t.shape[1]),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, g_need, 5, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(v, *ops, banks_t)

    # patch the reflect-pad edge frames with the exact reference math
    left_f = [f for f in range(n_frames) if f * hop < pad]
    right_f = [f for f in range(n_frames) if f * hop + pad > len_xe]
    if left_f or right_f:
        edge = _edge_frames_logmel(wave, banks_t, cfg, left_f, right_f)
        nl = len(left_f)
        if left_f:
            out = jax.lax.dynamic_update_slice(out, edge[:, :nl], (0, 0, 0))
        if right_f:
            out = jax.lax.dynamic_update_slice(out, edge[:, nl:],
                                               (0, right_f[0], 0))

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
    7e-5 of fp32 on broadband signals and 1.6e-3 worst-case at deep
    spectral nulls of pure tones (scripts/bench_mel_precision.py; the
    pre-emphasis folding keeps its cancellation out of bf16), ~1.4x
    faster — far tighter than the reference's own fp16-autocast STFT
    (ex_audioset.py:304). Pass ``jax.lax.Precision.HIGHEST`` for
    bit-level parity work (4e-5 vs a same-banks float64 oracle; the
    residual vs a pure-float64 oracle is fp32 filterbank-construction
    rounding shared with torchaudio, see bench_mel_precision.py).
    """
    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.melspec import log_mel_spectrogram

    use_pallas = backend == "pallas" or (
        backend == "auto" and pallas_supported(cfg)
        # the kernel holds one clip's whole sample track in VMEM (fetched
        # once, revisited per frame tile): ~4*S bytes double-buffered next
        # to the 4 MB basis — cap the auto path at ~30 s of 32 kHz audio
        # (windowed inference batches 10 s windows well below this)
        and 4096 <= waveform.shape[-1] <= 1_000_000
        and jax.default_backend() == "tpu"
        and (jax.device_count() == 1 or mesh is not None))
    if not use_pallas:
        return log_mel_spectrogram(waveform, cfg, training=training, rng=rng)

    if training and rng is None:
        raise ValueError("training=True requires an rng key")

    # Python floats unless jittered: a traced fmin (and under jit even
    # jnp.asarray(const) is a Tracer) would silently switch kaldi_mel_banks
    # to its on-device fp32 construction — see ops/melspec.py, same fix.
    fmin, fmax = cfg.fmin, cfg.effective_fmax
    if training:
        r_fmin, r_fmax, r_freqm, r_timem = jax.random.split(rng, 4)
        fmin = jnp.asarray(fmin, jnp.float32) + jax.random.randint(
            r_fmin, (), 0, cfg.fmin_aug_range).astype(jnp.float32)
        fmax = jnp.asarray(fmax, jnp.float32) + (
            cfg.fmax_aug_range // 2 - jax.random.randint(
                r_fmax, (), 0, cfg.fmax_aug_range)).astype(jnp.float32)
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
