"""Analysis-tool checks against the reference's published complexity table."""

import numpy as np
import pytest

from efficientat_tpu.models.dymn import DyMNConfig
from efficientat_tpu.models.mn import MNConfig
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.tools.macs import count_macs
from efficientat_tpu.tools.peak_memory import peak_memory_cnn, peak_memory_mnv3
from efficientat_tpu.tools.receptive_field import receptive_field


# README.md:96-112 — MACs in billions for a 10 s clip (128 x 1000 input)
@pytest.mark.parametrize("width,macs_b", [
    (0.4, 0.11), (0.5, 0.16), (1.0, 0.54), (2.0, 2.06), (3.0, 4.55), (4.0, 8.03),
])
def test_mn_macs_match_reference_table(width, macs_b):
    got = count_macs(MNConfig(width_mult=width)) / 1e9
    assert abs(got - macs_b) <= 0.013, (got, macs_b)


@pytest.mark.parametrize("n_mels,macs_b", [(40, 0.21), (64, 0.27), (256, 1.08)])
def test_mn_macs_mel_variants(n_mels, macs_b):
    got = count_macs(MNConfig(), input_f=n_mels) / 1e9
    assert abs(got - macs_b) <= 0.012, (got, macs_b)


@pytest.mark.parametrize("hop,macs_b", [(480, 0.36), (640, 0.27), (800, 0.22)])
def test_mn_macs_hop_variants(hop, macs_b):
    frames = MelConfig(hopsize=hop).num_frames(320000)
    got = count_macs(MNConfig(), input_t=frames) / 1e9
    assert abs(got - macs_b) <= 0.012, (got, macs_b)


@pytest.mark.parametrize("width,macs_b,tol", [
    (0.4, 0.12, 0.015), (1.0, 0.58, 0.03), (2.0, 2.20, 0.1),
])
def test_dymn_macs_match_reference_table(width, macs_b, tol):
    got = count_macs(DyMNConfig(width_mult=width)) / 1e9
    assert abs(got - macs_b) <= tol, (got, macs_b)


def test_receptive_field_reasonable():
    rf_f, rf_t = receptive_field(MNConfig())
    # MobileNetV3-Large RF is several hundred input cells on each axis
    assert 200 < rf_f < 1500 and 200 < rf_t < 1500
    assert receptive_field(MNConfig()) == receptive_field(MNConfig())
    # fewer downsampling strides shrink the receptive field
    rf_f2, _ = receptive_field(MNConfig(strides=(2, 2, 1, 1)))
    assert rf_f2 < rf_f
    # DyMN plan also works (context convs are 1x1 and don't change RF)
    rff, rft = receptive_field(DyMNConfig())
    assert (rff, rft) == (rf_f, rf_t)


def test_peak_memory_estimates():
    cfg = MNConfig()
    full = peak_memory_cnn(cfg)
    efficient = peak_memory_mnv3(cfg)
    assert efficient < full  # sliced inference must reduce the peak
    assert 100 < efficient < 10000  # plausible kB range for 10 s fp16
    # larger width -> more memory
    assert peak_memory_cnn(MNConfig(width_mult=2.0)) > full
    # fp32 doubles
    np.testing.assert_allclose(peak_memory_cnn(cfg, bits_per_elem=32), full * 2)


def test_complexity_report_runs(capsys):
    from efficientat_tpu.tools.complexity import report_complexity

    total = report_complexity("mn04_as", measure="macs")
    out = capsys.readouterr().out
    assert "0.11 billion multiply-accumulate" in out
    assert "0.98 million parameters" in out
    report_complexity("mn04_as", measure="memory")
    out = capsys.readouterr().out
    assert "peak memory" in out
