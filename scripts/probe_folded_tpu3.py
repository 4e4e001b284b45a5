"""Stage-3 probe: WHERE is the TPU mel path's 2e-2? Error map by
(mel bin, frame) + the contributing FFT-bin powers at the argmax.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
           python scripts/probe_folded_tpu3.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import MelConfig, stft_power_folded
from probe_folded_tpu import f64_power_oracle

SR = 32000


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    wave = (0.2 * np.sin(2 * np.pi * 95.5 * t)
            + 0.01 * rng.normal(size=t.size)).astype(np.float32)[None]
    w = jnp.asarray(wave)

    oracle_p = f64_power_oracle(wave, cfg.n_fft, cfg.hopsize, cfg.win_length)
    banks = np.asarray(kaldi_mel_banks(
        cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
        cfg.effective_fmax)).astype(np.float64)

    def logmel(p):
        return (np.log(np.einsum("mf,btf->bmt", banks, p) + 1e-5) + 4.5) / 5.0

    want = logmel(oracle_p)
    pf = np.asarray(jax.jit(lambda w: stft_power_folded(
        w, cfg.n_fft, cfg.hopsize, cfg.win_length))(w)).astype(np.float64)
    got = logmel(pf)

    err = np.abs(got - want)[0]  # (mel, frames)
    out = {"total_max": float(err.max())}
    # top-5 locations
    flat = np.argsort(err.ravel())[::-1][:5]
    locs = []
    for idx in flat:
        m, f = divmod(int(idx), err.shape[1])
        mel_o = float(np.einsum("f,f->", banks[m], oracle_p[0, f]))
        mel_d = float(np.einsum("f,f->", banks[m], pf[0, f]))
        locs.append({"mel": m, "frame": f, "err": float(err[m, f]),
                     "mel_oracle": mel_o, "mel_dev": mel_d})
    out["top5"] = locs
    # error by frame-class: edge frames (0,1,last) vs interior
    out["err_edge_frames"] = float(err[:, [0, 1, err.shape[1] - 1]].max())
    out["err_interior"] = float(err[:, 2:-1].max())
    # power abs diff histogram summary at the worst frame
    f = locs[0]["frame"]
    dp = np.abs(pf[0, f] - oracle_p[0, f])
    out["worst_frame_power_maxdiff"] = float(dp.max())
    out["worst_frame_power_bin"] = int(dp.argmax())
    out["worst_frame_power_dev"] = float(pf[0, f, dp.argmax()])
    out["worst_frame_power_oracle"] = float(oracle_p[0, f, dp.argmax()])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
