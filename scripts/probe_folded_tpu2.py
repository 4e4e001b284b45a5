"""Stage-2 probe: which STAGE of the XLA mel path carries the 2e-2?

Takes the on-device power from (a) stft_power_folded and (b) the
reference-order stft_power(preemphasis(x)), pushes each through an EXACT
host f64 mel+log, and compares with the full f64 oracle — then also runs
the device mel einsum on the HOST-ORACLE power. Whichever hybrid shows
the error names the stage.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_folded_tpu2.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import (MelConfig, preemphasis, stft_power,
                                         stft_power_folded)
from probe_folded_tpu import f64_power_oracle

SR = 32000


def main():
    cfg = MelConfig()
    rng = np.random.default_rng(3)
    t = np.arange(10 * SR) / SR
    waves = np.stack([
        rng.normal(size=t.size) * 1e-3,
        0.2 * np.sin(2 * np.pi * 95.5 * t) + 0.01 * rng.normal(size=t.size),
    ]).astype(np.float32)
    w = jnp.asarray(waves)
    out = {}

    oracle_p = f64_power_oracle(waves, cfg.n_fft, cfg.hopsize, cfg.win_length)
    banks = np.asarray(kaldi_mel_banks(
        cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
        cfg.effective_fmax)).astype(np.float64)

    def logmel(p):
        return (np.log(np.einsum("mf,btf->bmt", banks, p) + 1e-5) + 4.5) / 5.0

    want = logmel(oracle_p)

    pf = np.asarray(jax.jit(lambda w: stft_power_folded(
        w, cfg.n_fft, cfg.hopsize, cfg.win_length))(w)).astype(np.float64)
    pr = np.asarray(jax.jit(lambda w: stft_power(
        preemphasis(w), cfg.n_fft, cfg.hopsize,
        cfg.win_length))(w)).astype(np.float64)

    out["folded_power_to_f64mel_abserr"] = float(np.abs(logmel(pf) - want).max())
    out["reforder_power_to_f64mel_abserr"] = float(np.abs(logmel(pr) - want).max())

    # device mel einsum on oracle power: isolates the mel matmul + log
    op32 = jnp.asarray(oracle_p.astype(np.float32))
    got = np.asarray(jax.jit(lambda p: (jnp.log(jnp.einsum(
        "mf,btf->bmt", jnp.asarray(banks.astype(np.float32)), p,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + 1e-5) + 4.5) / 5.0)(op32))
    out["oraclepower_devmel_abserr"] = float(np.abs(got - want).max())

    # per-wave breakdown of the folded hybrid
    err = np.abs(logmel(pf) - want)
    out["folded_err_wave0_nearfloor"] = float(err[0].max())
    out["folded_err_wave1_tonal"] = float(err[1].max())
    err_r = np.abs(logmel(pr) - want)
    out["reforder_err_wave0_nearfloor"] = float(err_r[0].max())
    out["reforder_err_wave1_tonal"] = float(err_r[1].max())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
