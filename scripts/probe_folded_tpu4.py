"""Stage-4 probe: is the on-device frame_signal+einsum FUSION what loses
fp32 precision on TPU?

  1. frames from device frame_signal vs host framing: bit-exact?
  2. einsum HIGHEST on committed device frames: faithful?
  3. einsum HIGHEST fused with frame_signal in ONE jit: faithful?
  4. if (3) is bad, dump the optimized HLO's dot ops + precision config.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu4.py
"""

import json
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.melspec import _dft_basis, frame_signal, preemphasis

SR = 32000
N_FFT, HOP, WIN = 1024, 320, 800


def main():
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    wave = (0.2 * np.sin(2 * np.pi * 95.5 * t)
            + 0.01 * rng.normal(size=t.size)).astype(np.float32)[None]
    xe = (wave[:, 1:] - 0.97 * wave[:, :-1])  # host fp32 preemphasis
    n_frames = xe.shape[1] // HOP + 1

    # host framing (reflect pad), f64 reference projection
    pad = N_FFT // 2
    xp = np.pad(xe.astype(np.float64), ((0, 0), (pad, pad)), mode="reflect")
    fr_host = np.stack([xp[:, f * HOP:f * HOP + N_FFT]
                        for f in range(n_frames)], axis=1)
    basis = _dft_basis(N_FFT, WIN)
    want = fr_host @ basis.astype(np.float64)

    out = {}
    xe_j = jnp.asarray(xe)

    # 1. device framing bit-exactness
    fr_dev = np.asarray(jax.jit(
        lambda x: frame_signal(x, N_FFT, HOP, n_frames))(xe_j))
    out["frames_bitexact"] = bool(
        (fr_dev == fr_host.astype(np.float32)).all())
    out["frames_maxdiff"] = float(
        np.abs(fr_dev - fr_host.astype(np.float32)).max())

    def ein(f):
        return jnp.einsum("btn,nk->btk", f, jnp.asarray(basis),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    # 2. einsum on committed device frames
    p2 = np.asarray(jax.jit(ein)(jnp.asarray(fr_dev)))
    out["proj_committed_abserr"] = float(np.abs(p2 - want).max())

    # 3. fused framing+einsum in one jit
    fused = jax.jit(lambda x: ein(frame_signal(x, N_FFT, HOP, n_frames)))
    p3 = np.asarray(fused(xe_j))
    out["proj_fused_abserr"] = float(np.abs(p3 - want).max())

    # 4. HLO dots of the fused program
    try:
        txt = fused.lower(xe_j).compile().as_text()
        dots = [l.strip()[:300] for l in txt.splitlines()
                if re.search(r"dot\(|convolution\(", l)]
        out["hlo_dots"] = dots[:6]
    except Exception as e:
        out["hlo_dots_error"] = str(e)[:200]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
