"""Stage-5 probe: bisect stft_power_folded's composition on TPU.

One jit returns every intermediate (frames, proj, power-no-patch,
power-patched); each is compared against host float64. Also a no-patch
jit and a proj-only jit, to see whether the EDGE PATCH (dynamic_update_
slice) or the POWER square changes what XLA emits for the big GEMM.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu5.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.melspec import (_edge_power, _folded_dft_basis,
                                         frame_signal)

SR = 32000
N_FFT, HOP, WIN = 1024, 320, 800
PAD = N_FFT // 2


def main():
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    wave = (0.2 * np.sin(2 * np.pi * 95.5 * t)
            + 0.01 * rng.normal(size=t.size)).astype(np.float32)[None]
    w = jnp.asarray(wave)
    len_xe = wave.shape[1] - 1
    n_frames = len_xe // HOP + 1
    b32 = _folded_dft_basis(N_FFT, WIN)

    # f64 references
    xz = np.pad(wave.astype(np.float64), ((0, 0), (PAD, PAD)))
    fr64 = np.stack([xz[:, f * HOP:f * HOP + N_FFT]
                     for f in range(n_frames)], axis=1)
    want_proj = fr64 @ b32.astype(np.float64)
    n_freq = N_FFT // 2 + 1
    want_pow = want_proj[..., :n_freq] ** 2 + want_proj[..., n_freq:] ** 2

    left_f = [f for f in range(n_frames) if f * HOP < PAD]
    right_f = [f for f in range(n_frames) if f * HOP + PAD > len_xe]

    def body(x):
        frames = frame_signal(x, N_FFT, HOP, n_frames, pad_mode="constant")
        proj = jnp.einsum("btn,nk->btk", frames, jnp.asarray(b32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        power = proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2
        edge = _edge_power(x, N_FFT, HOP, WIN, left_f, right_f)
        nl = len(left_f)
        patched = jax.lax.dynamic_update_slice(power, edge[:, :nl], (0, 0, 0))
        patched = jax.lax.dynamic_update_slice(
            patched, edge[:, nl:], (0, right_f[0], 0))
        return frames, proj, power, patched

    frames, proj, power, patched = (np.asarray(v) for v in
                                    jax.jit(body)(w))
    out = {
        "frames_maxdiff": float(
            np.abs(frames - fr64.astype(np.float32)).max()),
        "proj_abserr": float(np.abs(proj - want_proj).max()),
        "power_nopatch_abserr_interior": float(
            np.abs(power[:, 2:-1] - want_pow[:, 2:-1]).max()),
        "patched_abserr_interior": float(
            np.abs(patched[:, 2:-1] - want_pow[:, 2:-1]).max()),
    }

    # power-only jit (what stft_power_folded returns)
    po = np.asarray(jax.jit(lambda x: body(x)[3])(w))
    out["poweronly_abserr_interior"] = float(
        np.abs(po[:, 2:-1] - want_pow[:, 2:-1]).max())
    # interior relative at the probe-3 hotspot
    out["poweronly_frame545_bin2"] = [float(po[0, 545, 2]),
                                      float(want_pow[0, 545, 2])]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
