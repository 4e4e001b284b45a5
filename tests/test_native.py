"""Native C++ runtime tests (auto-builds the library; skips if no toolchain)."""

import numpy as np
import pytest
import scipy.io.wavfile
import scipy.signal

from efficientat_tpu.data import native

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native toolchain unavailable")

DEMO_WAV = "/root/reference/resources/metro_station-paris.wav"


def test_read_wav_matches_scipy(tmp_path):
    wave, sr = native.read_wav(DEMO_WAV)
    sr_ref, pcm = scipy.io.wavfile.read(DEMO_WAV)
    ref = pcm.astype(np.float32) / 2147483648.0
    assert sr == sr_ref
    np.testing.assert_allclose(wave, ref, atol=1e-7)

    # int16 stereo roundtrip with mono mixdown
    rng = np.random.default_rng(0)
    stereo = (rng.normal(scale=0.2, size=(1000, 2)) * 32767).astype(np.int16)
    p = str(tmp_path / "st.wav")
    scipy.io.wavfile.write(p, 16000, stereo)
    wave, sr = native.read_wav(p)
    want = (stereo / 32768.0).mean(axis=1).astype(np.float32)
    assert sr == 16000
    np.testing.assert_allclose(wave, want, atol=1e-6)


def test_read_wav_errors(tmp_path):
    with pytest.raises(IOError):
        native.read_wav("/nonexistent.wav")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all........")
    with pytest.raises(IOError):
        native.read_wav(str(bad))


@pytest.mark.parametrize("sr_in,sr_out", [(44100, 32000), (32000, 16000), (22050, 32000)])
def test_resample_matches_scipy(sr_in, sr_out):
    rng = np.random.default_rng(1)
    x = rng.normal(size=sr_in).astype(np.float32) * 0.3
    ours = native.resample(x, sr_in, sr_out)
    import math

    g = math.gcd(sr_in, sr_out)
    ref = scipy.signal.resample_poly(x, sr_out // g, sr_in // g)
    n = min(len(ours), len(ref))
    assert abs(len(ours) - len(ref)) <= 1
    np.testing.assert_allclose(ours[:n], ref[:n], atol=1e-5)


def test_prefetch_pool():
    pool = native.NativePrefetchPool(2, target_sr=32000, clip_samples=320000)
    try:
        for i in range(4):
            pool.submit(i, DEMO_WAV)
        results = {}
        for _ in range(4):
            jid, wave = pool.next()
            results[jid] = wave
        assert sorted(results) == [0, 1, 2, 3]
        for wave in results.values():
            assert wave.shape == (320000,)
        # all identical (same file)
        np.testing.assert_array_equal(results[0], results[3])
        # matches the python path
        from efficientat_tpu.data.audio_io import load_waveform

        py = load_waveform(DEMO_WAV, 32000)
        np.testing.assert_allclose(results[0][:len(py)], py[:320000], atol=1e-5)
    finally:
        pool.close()


def test_pool_error_path():
    pool = native.NativePrefetchPool(1, target_sr=32000, clip_samples=1000)
    try:
        pool.submit(0, "/nonexistent.wav")
        with pytest.raises(IOError):
            pool.next()
    finally:
        pool.close()
