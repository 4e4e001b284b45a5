"""Probe kernel variants for the fused mel front-end (run standalone).

Variants, all bf16x3 numerics with basis hi/lo precomputed outside:
- current: library kernel (in-kernel operand split, concat frame assembly)
- splitbasis: basis hi/lo precomputed outside the kernel
- folded: pre-emphasis FOLDED INTO THE BASIS (B'[j,k] = basis[j-1,k] -
  0.97*basis[j,k]; boundary terms vanish because the window is zero at the
  frame edges), so the XLA prep is a single constant pad of the raw wave —
  no pre-emphasis op (2.4 ms of misaligned lane slices), no reflect pad
  (1.3 ms). The ~3 edge frames per clip whose window touches the reflect
  pad are recomputed exactly in XLA on 2048-sample slivers and patched in.
- folded_tile256: same with 256-frame tiles (fewer grid steps)

Each prints ms/batch at B=64 and max|delta| vs the fp32 XLA reference.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SR = 32000
CLIP = 10
BATCH = 64
ITERS = 32
LANE = 64


def _time(fn, wave, iters=ITERS):
    """Time fn(wave) with a loop-index-dependent input so XLA cannot hoist
    the call out of the timing loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, wave):
        def body(i, acc):
            return acc + jnp.sum(fn(wave + i.astype(jnp.float32) * 1e-7))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(2, wave))
    t0 = time.perf_counter()
    float(run(iters, wave))
    return (time.perf_counter() - t0) / iters


@functools.lru_cache(maxsize=4)
def _folded_basis_no_nyquist(n_fft: int, win_length: int, coef: float = 0.97):
    """Pre-emphasis-folded windowed rDFT basis, built in float64.

    For xe[t] = x[t+1] - coef*x[t] and a windowed basis b[m,k] (window zero
    at m=0 and m=n_fft-1), sum_m b[m,k]*xe[q+m] == sum_j B'[j,k]*x[q+j]
    with B'[j,k] = b[j-1,k] - coef*b[j,k] (b[-1] := 0).
    """
    from efficientat_tpu.ops.melspec import hann_window

    n_freq = n_fft // 2 + 1
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = hann_window(win_length)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    basis = np.concatenate([np.cos(ang) * w[:, None], np.sin(ang) * w[:, None]], axis=1)
    # drop Nyquist columns -> (n_fft, n_fft)
    basis = np.concatenate([basis[:, : n_freq - 1],
                            basis[:, n_freq: 2 * n_freq - 1]], axis=1)
    shifted = np.vstack([np.zeros((1, basis.shape[1])), basis[:-1]])
    return (shifted - coef * basis).astype(np.float32)


def variant_kernel(wave_ref, bhi_ref, blo_ref, banks_ref, out_ref,
                   *, hop_rows, n_parts, n_bins, scratch_rows, frame_tile):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    rows_per_tile = frame_tile * hop_rows
    window = wave_ref[0, pl.ds(t * rows_per_tile, scratch_rows), :]
    view = window.reshape(scratch_rows // hop_rows, hop_rows, 2 * LANE)

    def part(v, p):
        return v[(2 * p // hop_rows):(2 * p // hop_rows) + frame_tile,
                 (2 * p) % hop_rows, :]

    # concat in fp32 (Mosaic rejects bf16 concat across sublane phases),
    # then split operands hi/lo
    frames = jnp.concatenate([part(view, p) for p in range(n_parts)], axis=1)
    fh = frames.astype(jnp.bfloat16)
    fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    proj = dot(fh, bhi_ref[:]) + (dot(fh, blo_ref[:]) + dot(fl, bhi_ref[:]))

    re = proj[:, :n_bins]
    im = proj[:, n_bins:]
    power = re * re + im * im
    mel = jnp.dot(power, banks_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = (jnp.log(mel + 1e-5) + 4.5) / 5.0


def _edge_frames_logmel(wave, banks_t, cfg, left_f, right_f, n_frames):
    """Exact (fp32 HIGHEST) log-mel rows for frames touching the reflect pad."""
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.ops.mel_pallas import _basis_no_nyquist

    n_fft, hop = cfg.n_fft, cfg.hopsize
    pad = n_fft // 2
    seg = 2048
    frames = []
    xe_l = wave[:, :seg][:, 1:] - 0.97 * wave[:, :seg][:, :-1]
    xep_l = jnp.pad(xe_l, ((0, 0), (pad, 0)), mode="reflect")
    for f in left_f:
        frames.append(xep_l[:, f * hop: f * hop + n_fft])
    len_xe = wave.shape[1] - 1
    xe_r = wave[:, -seg:][:, 1:] - 0.97 * wave[:, -seg:][:, :-1]
    xep_r = jnp.pad(xe_r, ((0, 0), (0, pad)), mode="reflect")
    base = wave.shape[1] - seg  # xe_r[i] == xe[base + i]
    for f in right_f:
        off = f * hop - pad - base
        frames.append(xep_r[:, off: off + n_fft])
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


def variant_mel(wave, banks, cfg, frame_tile=128, folded=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from efficientat_tpu.ops.mel_pallas import _basis_no_nyquist

    n_fft, hop = cfg.n_fft, cfg.hopsize
    hop_rows = hop // LANE
    n_parts = n_fft // (2 * LANE)
    n_bins = n_fft // 2
    pad = n_fft // 2

    if folded:
        len_xe = wave.shape[1] - 1
        n_frames = len_xe // hop + 1
        n_tiles = -(-n_frames // frame_tile)
        max_parts_off = 2 * (n_parts - 1)
        scratch_rows = -(-(frame_tile * hop_rows + max_parts_off) // hop_rows) * hop_rows
        rows_needed = n_tiles * frame_tile * hop_rows + scratch_rows
        total = (rows_needed + 1) * LANE
        x = jnp.pad(wave, ((0, 0), (pad, total - pad - wave.shape[1])))
        basis_np = _folded_basis_no_nyquist(n_fft, cfg.win_length)
    else:
        x = wave[:, 1:] - 0.97 * wave[:, :-1]
        n_frames = x.shape[1] // hop + 1
        n_tiles = -(-n_frames // frame_tile)
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        max_parts_off = 2 * (n_parts - 1)
        scratch_rows = -(-(frame_tile * hop_rows + max_parts_off) // hop_rows) * hop_rows
        rows_needed = n_tiles * frame_tile * hop_rows + scratch_rows
        total = (rows_needed + 1) * LANE
        x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
        basis_np = np.asarray(_basis_no_nyquist(n_fft, cfg.win_length))

    chunks = x.reshape(x.shape[0], rows_needed + 1, LANE)
    wave2d = jnp.concatenate([chunks[:, :-1], chunks[:, 1:]], axis=-1)

    bhi_np = basis_np.astype(np.float32).astype(jnp.bfloat16)
    bhi = jnp.asarray(bhi_np)
    blo = jnp.asarray((basis_np - np.asarray(bhi_np, np.float32)).astype(jnp.bfloat16))
    banks_t = jnp.transpose(banks[:, :n_bins], (1, 0)).astype(jnp.float32)

    b = wave2d.shape[0]
    kernel = functools.partial(variant_kernel, hop_rows=hop_rows,
                               n_parts=n_parts, n_bins=n_bins,
                               scratch_rows=scratch_rows,
                               frame_tile=frame_tile)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, rows_needed, 2 * LANE), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, banks_t.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frame_tile, banks_t.shape[1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * frame_tile, banks_t.shape[1]),
                                       jnp.float32),
    )(wave2d, bhi, blo, banks_t)

    if folded:
        left_f = [f for f in range(n_frames) if f * hop < pad]
        right_f = [f for f in range(n_frames) if f * hop + pad > len_xe]
        edge = _edge_frames_logmel(wave, banks_t, cfg, left_f, right_f, n_frames)
        nl = len(left_f)
        out = jax.lax.dynamic_update_slice(out, edge[:, :nl], (0, 0, 0))
        out = jax.lax.dynamic_update_slice(out, edge[:, nl:], (0, right_f[0], 0))

    return jnp.transpose(out[:, :n_frames, :], (0, 2, 1))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.mel_pallas import stft_log_mel_pallas
    from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

    cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(BATCH, CLIP * SR)).astype(np.float32) * 0.1)
    banks = jnp.asarray(kaldi_mel_banks(128, 1024, SR, 0.0, 15000.0))

    ref = np.asarray(log_mel_spectrogram(waves, cfg))  # fp32 XLA exact

    cur = np.asarray(stft_log_mel_pallas(waves, banks, cfg, "bf16x3"))
    dt = _time(lambda w: stft_log_mel_pallas(w, banks, cfg, "bf16x3"), waves)
    print(json.dumps({"variant": "current", "ms": round(dt * 1e3, 3),
                      "max_vs_ref": float(np.abs(cur - ref).max())}))

    for name, ft, folded in [("splitbasis", 128, False),
                             ("folded", 128, True),
                             ("folded_tile256", 256, True),
                             ("folded_tile512", 512, True)]:
        try:
            got = np.asarray(variant_mel(waves, banks, cfg, ft, folded))
            err = float(np.abs(got - ref).max())
            dt = _time(lambda w: variant_mel(w, banks, cfg, ft, folded), waves)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "max_vs_ref": err}))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()


# ---- DMA-assembled frame variants ----------------------------------------

def dma_kernel(wave_ref, bhi_ref, blo_ref, banks_ref, out_ref, frames_ref, sems,
               *, hop_rows, n_parts, n_bins, frame_tile, sub64):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    copies = []
    if sub64:
        # 16 sub-tile DMAs from the undoubled chunk view (B, C/5, 5, 64)
        for c in range(2 * n_parts):
            src = wave_ref.at[b, pl.ds(t * frame_tile + c // hop_rows, frame_tile),
                              c % hop_rows, :]
            dst = frames_ref.at[:, pl.ds(LANE * c, LANE)]
            copies.append(pltpu.make_async_copy(src, dst, sems.at[c]))
    else:
        # 8 full-tile DMAs from the overlapped view (B, R/5, 5, 128)
        for p in range(n_parts):
            src = wave_ref.at[b, pl.ds(t * frame_tile + (2 * p) // hop_rows, frame_tile),
                              (2 * p) % hop_rows, :]
            dst = frames_ref.at[:, pl.ds(2 * LANE * p, 2 * LANE)]
            copies.append(pltpu.make_async_copy(src, dst, sems.at[p]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    frames = frames_ref[:]
    fh = frames.astype(jnp.bfloat16)
    fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    proj = dot(fh, bhi_ref[:]) + (dot(fh, blo_ref[:]) + dot(fl, bhi_ref[:]))
    re = proj[:, :n_bins]
    im = proj[:, n_bins:]
    power = re * re + im * im
    mel = jnp.dot(power, banks_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = (jnp.log(mel + 1e-5) + 4.5) / 5.0


def variant_mel_dma(wave, banks, cfg, frame_tile=128, sub64=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_fft, hop = cfg.n_fft, cfg.hopsize
    hop_rows = hop // LANE
    n_parts = n_fft // (2 * LANE)
    n_bins = n_fft // 2
    pad = n_fft // 2

    len_xe = wave.shape[1] - 1
    n_frames = len_xe // hop + 1
    n_tiles = -(-n_frames // frame_tile)
    basis_np = _folded_basis_no_nyquist(n_fft, cfg.win_length)

    if sub64:
        # chunk c of frame i = chunks[5i + c]; max chunk = 5*(n_tiles*ft-1)+16
        n_chunks = hop_rows * (n_tiles * frame_tile - 1) + 2 * n_parts + 1
        n_groups = -(-n_chunks // hop_rows)
        total = n_groups * hop_rows * LANE
        x = jnp.pad(wave, ((0, 0), (pad, total - pad - wave.shape[1])))
        wave_v = x.reshape(x.shape[0], n_groups, hop_rows, LANE)
        n_sems = 2 * n_parts
    else:
        max_parts_off = 2 * (n_parts - 1)
        scratch_rows = -(-(frame_tile * hop_rows + max_parts_off) // hop_rows) * hop_rows
        rows_needed = n_tiles * frame_tile * hop_rows + scratch_rows
        total = (rows_needed + 1) * LANE
        x = jnp.pad(wave, ((0, 0), (pad, total - pad - wave.shape[1])))
        chunks = x.reshape(x.shape[0], rows_needed + 1, LANE)
        wave2d = jnp.concatenate([chunks[:, :-1], chunks[:, 1:]], axis=-1)
        wave_v = wave2d.reshape(wave.shape[0], rows_needed // hop_rows, hop_rows, 2 * LANE)
        n_sems = n_parts

    bhi_np = basis_np.astype(np.float32).astype(jnp.bfloat16)
    bhi = jnp.asarray(bhi_np)
    blo = jnp.asarray((basis_np - np.asarray(bhi_np, np.float32)).astype(jnp.bfloat16))
    banks_t = jnp.transpose(banks[:, :n_bins], (1, 0)).astype(jnp.float32)

    b = wave_v.shape[0]
    kernel = functools.partial(dma_kernel, hop_rows=hop_rows, n_parts=n_parts,
                               n_bins=n_bins, frame_tile=frame_tile, sub64=sub64)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, banks_t.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frame_tile, banks_t.shape[1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * frame_tile, banks_t.shape[1]),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((frame_tile, n_fft), jnp.float32),
                        pltpu.SemaphoreType.DMA((n_sems,))],
    )(wave_v, bhi, blo, banks_t)

    left_f = [f for f in range(n_frames) if f * hop < pad]
    right_f = [f for f in range(n_frames) if f * hop + pad > len_xe]
    edge = _edge_frames_logmel(wave, banks_t, cfg, left_f, right_f, n_frames)
    nl = len(left_f)
    import jax.lax as lax
    out = lax.dynamic_update_slice(out, edge[:, :nl], (0, 0, 0))
    out = lax.dynamic_update_slice(out, edge[:, nl:], (0, right_f[0], 0))
    return jnp.transpose(out[:, :n_frames, :], (0, 2, 1))


def main_dma():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

    cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(BATCH, CLIP * SR)).astype(np.float32) * 0.1)
    banks = jnp.asarray(kaldi_mel_banks(128, 1024, SR, 0.0, 15000.0))
    ref = np.asarray(log_mel_spectrogram(waves, cfg))

    for name, ft, sub in [("dma8_t128", 128, False), ("dma8_t256", 256, False),
                          ("dma16_t128", 128, True), ("dma16_t256", 256, True)]:
        try:
            got = np.asarray(variant_mel_dma(waves, banks, cfg, ft, sub))
            err = float(np.abs(got - ref).max())
            dt = _time(lambda w: variant_mel_dma(w, banks, cfg, ft, sub), waves)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "max_vs_ref": err}))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}))


if __name__ == "__main__" and os.environ.get("PROBE_DMA"):
    main_dma()


# ---- Design E: undoubled view, in-kernel even/odd assembly ---------------

def e_kernel(v_ref, bhi_ref, blo_ref, banks_ref, out_ref,
             *, n_bins, passes):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    jt = t * 64
    # even frame i=2j, part q (128 samples): group j + (q+1)//5, phase (q+1)%5
    ev = [v_ref[0, pl.ds(jt + (q + 1) // 5, 64), (q + 1) % 5, :]
          for q in range(8)]
    E = jnp.concatenate(ev, axis=1)  # (64, 1024)
    # odd frame i=2j+1, part q: lanes[64:] of (j+(3+q)//5, (3+q)%5) ++
    # lanes[:64] of the next chunk
    od = []
    for q in range(8):
        a = v_ref[0, pl.ds(jt + (3 + q) // 5, 64), (3 + q) % 5, :]
        b2 = v_ref[0, pl.ds(jt + (4 + q) // 5, 64), (4 + q) % 5, :]
        od.append(jnp.concatenate([a[:, 64:], b2[:, :64]], axis=1))
    O = jnp.concatenate(od, axis=1)  # (64, 1024)
    frames = jnp.concatenate([E, O], axis=0)  # (128, 1024) [evens; odds]

    fh = frames.astype(jnp.bfloat16)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    if passes == 3:
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        proj = dot(fh, bhi_ref[:]) + (dot(fh, blo_ref[:]) + dot(fl, bhi_ref[:]))
    elif passes == 21:  # frames exact (split), basis bf16 hi only
        fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        proj = dot(fh, bhi_ref[:]) + dot(fl, bhi_ref[:])
    else:  # 22: basis exact (split), frames bf16 hi only
        proj = dot(fh, bhi_ref[:]) + dot(fh, blo_ref[:])
    re = proj[:, :n_bins]
    im = proj[:, n_bins:]
    power = re * re + im * im
    mel = jnp.dot(power, banks_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    m = (jnp.log(mel + 1e-5) + 4.5) / 5.0
    # interleave evens/odds back to frame order
    out_ref[0] = jnp.stack([m[:64], m[64:]], axis=1).reshape(128, 128)


def variant_mel_e(wave, banks, cfg, passes=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_fft, hop = cfg.n_fft, cfg.hopsize
    n_bins = n_fft // 2
    pad = n_fft // 2
    assert n_fft == 1024 and hop == 320
    frame_tile = 128

    len_xe = wave.shape[1] - 1
    n_frames = len_xe // hop + 1
    n_tiles = -(-n_frames // frame_tile)
    g_need = 64 * n_tiles + 2
    total = g_need * 640
    x = jnp.pad(wave, ((0, 0), (640, total - 640 - wave.shape[1])))
    v = x.reshape(x.shape[0], g_need, 5, 128)

    basis_np = _folded_basis_no_nyquist(n_fft, cfg.win_length)
    bhi_np = basis_np.astype(np.float32).astype(jnp.bfloat16)
    bhi = jnp.asarray(bhi_np)
    blo = jnp.asarray((basis_np - np.asarray(bhi_np, np.float32)).astype(jnp.bfloat16))
    banks_t = jnp.transpose(banks[:, :n_bins], (1, 0)).astype(jnp.float32)

    b = v.shape[0]
    kernel = functools.partial(e_kernel, n_bins=n_bins, passes=passes)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, g_need, 5, 128), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_fft), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, banks_t.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frame_tile, banks_t.shape[1]),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * frame_tile, banks_t.shape[1]),
                                       jnp.float32),
    )(v, bhi, blo, banks_t)

    left_f = [f for f in range(n_frames) if f * hop < pad]
    right_f = [f for f in range(n_frames) if f * hop + pad > len_xe]
    edge = _edge_frames_logmel(wave, banks_t, cfg, left_f, right_f, n_frames)
    nl = len(left_f)
    out = jax.lax.dynamic_update_slice(out, edge[:, :nl], (0, 0, 0))
    out = jax.lax.dynamic_update_slice(out, edge[:, nl:], (0, right_f[0], 0))
    return jnp.transpose(out[:, :n_frames, :], (0, 2, 1))


def main_e():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

    cfg = MelConfig()
    rng = np.random.default_rng(0)
    waves = jnp.asarray(rng.normal(size=(BATCH, CLIP * SR)).astype(np.float32) * 0.1)
    banks = jnp.asarray(kaldi_mel_banks(128, 1024, SR, 0.0, 15000.0))
    ref = np.asarray(log_mel_spectrogram(waves, cfg))

    for name, p in [("e_3pass", 3), ("e_2pass_framesplit", 21),
                    ("e_2pass_basissplit", 22)]:
        try:
            got = np.asarray(variant_mel_e(waves, banks, cfg, p))
            err = float(np.abs(got - ref).max())
            dt = _time(lambda w: variant_mel_e(w, banks, cfg, p), waves)
            print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                              "max_vs_ref": err}))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}))


if __name__ == "__main__" and os.environ.get("PROBE_E"):
    main_e()
