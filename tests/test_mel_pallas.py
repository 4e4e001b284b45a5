"""Fused Pallas mel kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientat_tpu.ops.filterbank import kaldi_mel_banks
from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram, preemphasis
from efficientat_tpu.ops import mel_pallas


def _fused_interpret(wave, cfg, dft_precision=None):
    from jax.experimental.pallas import tpu as pltpu

    banks = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin,
                            cfg.effective_fmax)
    with pltpu.force_tpu_interpret_mode():
        return mel_pallas.stft_log_mel_pallas(jnp.asarray(wave), banks, cfg,
                                              dft_precision)


def test_pallas_supported_configs():
    assert mel_pallas.pallas_supported(MelConfig())           # hop 320
    assert mel_pallas.pallas_supported(MelConfig(hopsize=640))
    assert not mel_pallas.pallas_supported(MelConfig(hopsize=800))
    assert not mel_pallas.pallas_supported(MelConfig(hopsize=160))
    assert not mel_pallas.pallas_supported(MelConfig(n_fft=2048))


@pytest.mark.parametrize("n_samples,hop,batch", [
    (32000, 320, 2), (320000, 320, 2), (64000, 640, 2),
    (32100, 320, 2), (65000, 640, 2), (96000, 320, 1)])
@pytest.mark.slow
def test_fused_matches_xla_path(n_samples, hop, batch):
    cfg = MelConfig(hopsize=hop)
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(batch, n_samples)).astype(np.float32) * 0.1
    want = np.asarray(log_mel_spectrogram(wave, cfg, training=False))
    got = np.asarray(_fused_interpret(wave, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_dropin_falls_back():
    # unsupported hop on CPU backend -> silently uses the XLA path
    cfg = MelConfig(hopsize=800)
    wave = np.random.default_rng(1).normal(size=(1, 32000)).astype(np.float32)
    out = mel_pallas.log_mel_spectrogram_fused(wave, cfg, backend="auto")
    want = log_mel_spectrogram(wave, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


@pytest.mark.slow
def test_fused_training_masks_interpret():
    from jax.experimental.pallas import tpu as pltpu

    cfg = MelConfig()
    wave = np.random.default_rng(2).normal(size=(2, 32000)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = mel_pallas.log_mel_spectrogram_fused(
            wave, cfg, training=True, rng=jax.random.PRNGKey(0), backend="pallas")
    out = np.asarray(out)
    assert out.shape == (2, 128, 100)
    assert (out == 0.9).sum() > 0  # SpecAugment fill value present


@pytest.mark.slow
def test_fused_sharded_over_mesh_interpret():
    """shard_map'd kernel over a 4-device CPU mesh == XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from efficientat_tpu.parallel import make_mesh, shard_batch

    cfg = MelConfig()
    wave = np.random.default_rng(5).normal(size=(8, 32000)).astype(np.float32) * 0.1
    mesh = make_mesh(4)
    w = shard_batch({"w": jnp.asarray(wave)}, mesh)["w"]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.jit(
            lambda x: mel_pallas.log_mel_spectrogram_fused(
                x, cfg, backend="pallas", mesh=mesh,
                dft_precision=jax.lax.Precision.HIGHEST))(w))
    want = np.asarray(log_mel_spectrogram(wave, cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_bf16x3_accuracy():
    """The default 3-pass split-operand DFT GEMM must stay within 2e-3 of
    the fp32 XLA path on null-heavy signals (measured on-chip: 1e-3 max,
    scripts/bench_mel_precision.py)."""
    cfg = MelConfig()
    rng = np.random.default_rng(4)
    t = np.arange(64000) / 32000.0
    wave = np.stack([
        (0.3 * np.sin(2 * np.pi * 137.7 * t)).astype(np.float32),  # deep nulls
        (rng.normal(size=64000) * 0.1).astype(np.float32),
        np.zeros(64000, np.float32),                               # silence
    ])
    want = np.asarray(_fused_interpret(wave, cfg, jax.lax.Precision.HIGHEST))
    got = np.asarray(_fused_interpret(wave, cfg, "bf16x3"))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
