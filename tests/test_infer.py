"""Inference path tests (Tagger, windowed tagging, CLI plumbing)."""

import warnings

import numpy as np
import pytest

from efficientat_tpu.data.audio_io import load_waveform, resample, stride_resample
from efficientat_tpu.infer.tag import Tagger
from efficientat_tpu.infer.windowed import tag_audio_window, window_signal

DEMO_WAV = "/root/reference/resources/metro_station-paris.wav"


def test_window_signal_shapes_and_padding():
    wave = np.arange(10.0, dtype=np.float32)
    w = window_signal(wave, window_samples=4, hop_samples=3)
    # windows: [0..3], [3..6], [6..9(pad)] -> ceil((10-4)/3)+1 = 3
    assert w.shape == (3, 4)
    np.testing.assert_array_equal(w[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(w[1], [3, 4, 5, 6])
    np.testing.assert_array_equal(w[2], [6, 7, 8, 9])

    # shorter than one window: single zero-padded window
    w = window_signal(np.ones(3, np.float32), 8, 4)
    assert w.shape == (1, 8)
    assert w[0, 3:].sum() == 0


def test_stride_resample_matches_reference_semantics():
    x = np.arange(16, dtype=np.float32)
    np.testing.assert_array_equal(stride_resample(x, 32000, 16000), x[::2])
    np.testing.assert_array_equal(stride_resample(x, 32000, 8000), x[::4])
    with pytest.raises(ValueError):
        stride_resample(x, 32000, 24000)


def test_load_waveform_demo_clip():
    wave = load_waveform(DEMO_WAV, target_sr=32000)
    assert wave.dtype == np.float32
    assert wave.shape == (320000,)  # 10 s at 32 kHz (from 44.1 kHz source)
    assert 0.1 < np.abs(wave).max() <= 1.0


def test_resample_preserves_tone():
    sr_in, sr_out = 44100, 32000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # the 440 Hz tone must dominate the resampled spectrum
    spec = np.abs(np.fft.rfft(y[:sr_out]))
    assert abs(np.argmax(spec) - 440) <= 1


@pytest.fixture(scope="module")
def tiny_tagger():
    return Tagger("mn04_as", pretrained=False)


@pytest.mark.slow
def test_tagger_predict_and_tag(tiny_tagger):
    probs = tiny_tagger.predict(np.zeros((2, 32000), np.float32))
    assert probs.shape == (2, 527)
    assert np.all((probs >= 0) & (probs <= 1))
    tags = tiny_tagger.tag(DEMO_WAV, top_k=5)
    assert len(tags) == 5
    assert all(isinstance(l, str) and 0 <= p <= 1 for l, p in tags)


@pytest.mark.slow
def test_windowed_tagging(tiny_tagger):
    res = tag_audio_window(tiny_tagger, DEMO_WAV, window_size=4.0, hop_length=2.0,
                           top_k=3)
    assert len(res) == 4  # ceil((10-4)/2)+1
    assert res[0]["start"] == 0.0 and res[0]["end"] == 4.0
    assert res[-1]["start"] == 6.0
    assert len(res[0]["tags"]) == 3


@pytest.mark.slow
def test_windowed_chunked_equals_unchunked(tiny_tagger):
    full = tag_audio_window(tiny_tagger, DEMO_WAV, 4.0, 2.0, top_k=3)
    chunked = tag_audio_window(tiny_tagger, DEMO_WAV, 4.0, 2.0, top_k=3, max_batch=2)
    for a, b in zip(full, chunked):
        for (la, pa), (lb, pb) in zip(a["tags"], b["tags"]):
            assert la == lb
            assert abs(pa - pb) < 1e-5


def test_ensemble_mel_config_mismatch_raises():
    # mn10_as_mels_256 uses a 256-band front-end; mixing it with the default
    # 128-band members must fail loudly instead of producing garbage.
    with pytest.raises(ValueError, match="mel front-end"):
        Tagger(["mn04_as", "mn10_as_mels_256"], pretrained=False)


@pytest.mark.slow
def test_ensemble_consistent_mel_configs_ok():
    t = Tagger(["mn04_as", "mn05_as"], pretrained=False)
    probs = t.predict(np.zeros((1, 32000), np.float32))
    assert probs.shape == (1, 527)
    assert np.isfinite(probs).all()


@pytest.mark.slow
def test_tagger_member_parallel_mesh_matches_replicated():
    """Same-arch ensemble with a (data, model) mesh == replicated path."""
    from efficientat_tpu.parallel import make_mesh

    names = ["mn05_as", "mn05_as"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = Tagger(names, pretrained=False)
        par = Tagger(names, pretrained=False, mesh=make_mesh(4, model_axis=2))
    assert par._stacked is not None  # member-parallel path engaged
    waves = np.random.default_rng(0).normal(size=(4, 32000)).astype(np.float32) * 0.1
    np.testing.assert_allclose(par.predict(waves), ref.predict(waves),
                               rtol=2e-5, atol=2e-5)
    # odd batch: auto-padded to the data axis, padding sliced back off
    np.testing.assert_allclose(par.predict(waves[:3]), ref.predict(waves[:3]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tagger_heterogeneous_mesh_falls_back():
    from efficientat_tpu.parallel import make_mesh

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t = Tagger(["mn05_as", "mn10_as"], pretrained=False,
                   mesh=make_mesh(4, model_axis=2))
    assert t._stacked is None  # different widths -> replicated path
    probs = t.predict(np.zeros((2, 32000), np.float32))
    assert probs.shape == (2, 527)


@pytest.mark.slow
def test_predict_accepts_coded_waves():
    """Tagger.predict on int16 / mu-law uint8 waves (in-program decode,
    data/wavecodec.py) must track the float32 predictions; separate
    programs per dtype may not collide in the jit cache."""
    from efficientat_tpu.data import wavecodec as wc

    t = Tagger("mn01_as", pretrained=False)
    rng = np.random.default_rng(0)
    w = np.clip(rng.normal(scale=0.15, size=(2, 32000)), -1, 1).astype(np.float32)
    pf = t.predict(w)
    pi = t.predict(wc.encode(w, "i16"))
    pu = t.predict(wc.encode(w, "mulaw8"))
    assert pf.shape == pi.shape == pu.shape
    np.testing.assert_allclose(pi, pf, atol=2e-4)   # i16: ~exact
    np.testing.assert_allclose(pu, pf, atol=3e-2)   # mulaw8: lossy
    assert len({k for k in t._jitted}) >= 3  # one program per dtype
