"""Stage-8 probe: does BATCHING change the XLA einsum's effective
precision on TPU?

probe6 (B=1, tonal wave): XLA folded path interior log-mel err 4.0e-6
vs true f64. probe7 (B=4 bench batch, same wave): 8.1e-3. Same code.
Hypothesis: the B>1 "btn,nk->btk" einsum lowers to a batched conv
whose HIGHEST handling is weaker than the B=1 dot.

Measures, on wave2 (tonal) interior frames, log-mel err vs f64:
  einsum at B=1 / B=4;  2D-reshaped jnp.dot at B=1 / B=4;
and dumps the optimized-HLO op carrying the GEMM for each variant.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu8.py
"""

import json
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import (MelConfig, _folded_dft_basis,
                                         frame_signal)
from probe_folded_tpu6 import folded_basis_f64

SR = 32000
N_FFT, HOP, WIN = 1024, 320, 800
PAD = N_FFT // 2


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    tone = (0.2 * np.sin(2 * np.pi * 95.5 * t)
            + 0.01 * rng.normal(size=t.size)).astype(np.float32)
    noise = (rng.normal(size=t.size) * 0.1).astype(np.float32)
    waves4 = np.stack([noise, tone, tone, tone])
    n_frames = (t.size - 1) // HOP + 1
    n_freq = N_FFT // 2 + 1

    b64 = folded_basis_f64(N_FFT, WIN)
    b32 = _folded_dft_basis(N_FFT, WIN)
    banks = np.asarray(kaldi_mel_banks(
        cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
        cfg.effective_fmax)).astype(np.float64)

    def want64_of(w):
        xz = np.pad(w.astype(np.float64), ((0, 0), (PAD, PAD)))
        fr = np.stack([xz[:, f * HOP:f * HOP + N_FFT]
                       for f in range(n_frames)], axis=1)
        p = fr @ b64
        return p[..., :n_freq] ** 2 + p[..., n_freq:] ** 2

    def logmel(p):
        return (np.log(np.einsum("mf,btf->bmt", banks, p) + 1e-5) + 4.5) / 5.0

    def path_einsum(x):
        frames = frame_signal(x, N_FFT, HOP, n_frames, pad_mode="constant")
        proj = jnp.einsum("btn,nk->btk", frames, jnp.asarray(b32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2

    def path_dot2d(x):
        frames = frame_signal(x, N_FFT, HOP, n_frames, pad_mode="constant")
        f2 = frames.reshape(-1, N_FFT)
        proj = jnp.dot(f2, jnp.asarray(b32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        proj = proj.reshape(x.shape[0], n_frames, -1)
        return proj[..., :n_freq] ** 2 + proj[..., n_freq:] ** 2

    out = {}
    for bname, w in (("B1", waves4[1:2]), ("B4", waves4)):
        lm64 = logmel(want64_of(w))
        for pname, fn in (("einsum", path_einsum), ("dot2d", path_dot2d)):
            jf = jax.jit(fn)
            got = np.asarray(jf(jnp.asarray(w))).astype(np.float64)
            err = np.abs(logmel(got) - lm64)[:, :, 2:-1]
            out[f"{pname}_{bname}_interior_max"] = float(err.max())
            hlo = jf.lower(jnp.asarray(w)).compile().as_text()
            gemms = sorted(set(re.findall(
                r"%(\w+)\.?\d* = f32\[[^\]]*\] (convolution|dot)\([^\n]*?"
                r"operand_precision=\{(\w+),", hlo)))
            out[f"{pname}_{bname}_hlo"] = ["|".join(g) for g in gemms][:4]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
