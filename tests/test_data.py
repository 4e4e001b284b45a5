"""Data-layer tests on synthetic fixtures (no real datasets needed)."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

from efficientat_tpu.data.core import (
    ConcatDataset,
    Dataset,
    Loader,
    MixupDataset,
    PreprocessDataset,
    WeightedEpochSampler,
    balanced_sample_weights,
    gain_aug,
    roll_aug,
    weighted_sample_without_replacement,
)
from efficientat_tpu.data.hdf5 import open_audio_hdf5, pad_or_truncate, write_pcm_hdf5


class ToyDataset(Dataset):
    def __init__(self, n=10, wave_len=100, n_classes=4):
        self.n, self.wave_len, self.n_classes = n, wave_len, n_classes

    def __len__(self):
        return self.n

    def get(self, index, rng):
        wave = np.full(self.wave_len, index, np.float32)
        target = np.zeros(self.n_classes, np.float32)
        target[index % self.n_classes] = 1
        return {"wave": wave, "fname": f"clip{index}", "target": target}


def test_roll_and_gain_aug():
    rng = np.random.default_rng(0)
    item = {"wave": np.arange(100, dtype=np.float32)}
    rolled = roll_aug(item, rng, shift_range=10)
    assert sorted(rolled["wave"]) == sorted(item["wave"])
    gained = gain_aug(item, rng, gain_augment=12)
    ratio = gained["wave"][1] / item["wave"][1]
    assert 10 ** (-12 / 20) <= ratio <= 10 ** (12 / 20)


def test_mixup_dataset_mask_aware():
    class TwoItem(Dataset):
        def __len__(self):
            return 2

        def get(self, index, rng):
            y = np.zeros(6, np.float32)  # 3 labels + 3 mask
            if index == 0:
                y[:3] = [0.9, 0.8, 0.7]
                y[3:] = [1, 1, 0]  # third label unobserved
            else:
                y[:3] = [0.1, 0.6, 0.5]
                y[3:] = [0, 1, 1]
            return {"wave": np.ones(50, np.float32) * (index + 1), "fname": str(index),
                    "target": y}

    ds = MixupDataset(TwoItem(), rate=1.0, mask_aware=True, n_labels=3)
    # find a seed whose second draw picks the OTHER item (idx2=1)
    for seed in range(20):
        probe = np.random.default_rng(seed)
        probe.random()
        if int(probe.integers(0, 2)) == 1:
            break
    item = ds.get(0, np.random.default_rng(seed))
    y = item["target"]
    # masks OR'd
    assert list(y[3:]) == [1, 1, 1]
    # unobserved label contributions zeroed before mixing
    assert y[0] <= 0.9 and y[2] <= 0.7


def test_balanced_sample_weights():
    t = np.array([[1, 0], [1, 0], [1, 1], [0, 0]], np.float32)
    w = balanced_sample_weights(t, offset=100)
    # class freqs: 3, 1 -> per-class 1000/103, 1000/101
    np.testing.assert_allclose(w[0], 1000 / 103)
    np.testing.assert_allclose(w[2], 1000 / 103 + 1000 / 101)
    np.testing.assert_allclose(w[3], 0.0)


def test_weighted_sampler_without_replacement():
    w = np.r_[np.full(50, 10.0), np.full(950, 0.1)]
    rng = np.random.default_rng(0)
    idx = weighted_sample_without_replacement(w, 100, rng)
    assert len(set(idx.tolist())) == 100  # no repeats
    # heavy items should nearly all be drawn
    assert (idx < 50).sum() >= 45

    s = WeightedEpochSampler(w, epoch_len=100, seed=7)
    a, b = s.indices(0), s.indices(0)
    np.testing.assert_array_equal(a, b)  # deterministic per epoch
    assert not np.array_equal(s.indices(0), s.indices(1))


def test_loader_batching_and_determinism():
    ds = PreprocessDataset(ToyDataset(n=23), lambda it, rng: it)
    for threads in (1, 4):
        loader = Loader(ds, batch_size=5, num_threads=threads, seed=3)
        batches = list(loader.epoch(0))
        assert len(batches) == 5
        assert batches[0]["wave"].shape == (5, 100)
        assert batches[-1]["wave"].shape == (3, 100)
        assert batches[0]["fname"][:2] == ["clip0", "clip1"]
    # drop_last
    loader = Loader(ds, batch_size=5, drop_last=True)
    assert len(list(loader.epoch(0))) == 4

    # augmentation results independent of thread count
    aug = PreprocessDataset(ToyDataset(n=16), lambda it, rng: gain_aug(it, rng, 12))
    l1 = list(Loader(aug, 4, num_threads=1, seed=5).epoch(2))
    l8 = list(Loader(aug, 4, num_threads=8, seed=5).epoch(2))
    for b1, b8 in zip(l1, l8):
        np.testing.assert_array_equal(b1["wave"], b8["wave"])


def test_concat_dataset():
    ds = ConcatDataset([ToyDataset(n=3), ToyDataset(n=2)])
    assert len(ds) == 5
    rng = np.random.default_rng(0)
    assert ds.get(3, rng)["fname"] == "clip0"  # second dataset index 0
    assert ds.get(2, rng)["fname"] == "clip2"


def test_pad_or_truncate():
    x = np.arange(10, dtype=np.float32)
    assert len(pad_or_truncate(x, 15)) == 15
    assert pad_or_truncate(x, 15)[10:].sum() == 0
    assert pad_or_truncate(x, None) is x
    np.testing.assert_array_equal(pad_or_truncate(x, 4), x[:4])
    rng = np.random.default_rng(0)
    crop = pad_or_truncate(x, 4, rng, random_offset=True)
    assert len(crop) == 4 and crop[0] in x


def test_pcm_hdf5_roundtrip(tmp_path):
    path = str(tmp_path / "toy_pcm.hdf")
    rng = np.random.default_rng(0)
    waves = [rng.normal(scale=0.1, size=rng.integers(5000, 8000)).astype(np.float32)
             for _ in range(3)]
    targets = np.packbits((rng.random((3, 527)) > 0.9).astype(np.uint8), axis=1)
    names = ["Yabc123.mp3", "Ydef456.mp3", "plain.wav"]
    write_pcm_hdf5(path, waves, targets, names)

    ds = open_audio_hdf5(path, clip_length_seconds=0.25, num_classes=527)
    assert len(ds) == 3
    item = ds.get(0, np.random.default_rng(1))
    assert item["wave"].shape == (8000,)  # 0.25 s at 32 kHz
    assert item["fname"] == "abc123"  # Y prefix and .mp3 stripped
    assert item["target"].shape == (527,)
    item2 = ds.get(2, np.random.default_rng(1))
    assert item2["fname"] == "plain.wav"
    # int16 quantization is lossless to ~3e-5
    np.testing.assert_allclose(item["wave"][:5000], waves[0][:5000], atol=4e-5)


def test_hdf5_meta_cache_size_guard(tmp_path):
    """Items read identically whether targets come from the bulk metadata
    cache or (over the size guard) per-item from disk."""
    path = str(tmp_path / "toy_pcm.hdf")
    rng = np.random.default_rng(3)
    waves = [rng.normal(scale=0.1, size=6000).astype(np.float32)
             for _ in range(3)]
    targets = np.packbits((rng.random((3, 527)) > 0.9).astype(np.uint8), axis=1)
    write_pcm_hdf5(path, waves, targets, ["Ya.mp3", "Yb.mp3", "Yc.mp3"])

    cached = open_audio_hdf5(path, clip_length_seconds=0.25, num_classes=527)
    on_disk = open_audio_hdf5(path, clip_length_seconds=0.25, num_classes=527)
    on_disk._META_CACHE_MAX_BYTES = 0  # force the over-guard path
    for i in range(3):
        a = cached.get(i, np.random.default_rng(7))
        b = on_disk.get(i, np.random.default_rng(7))
        assert a["fname"] == b["fname"]
        np.testing.assert_array_equal(a["target"], b["target"])
        np.testing.assert_array_equal(a["wave"], b["wave"])
    assert on_disk._meta()[1] is None  # guard actually kept targets on disk
    assert cached._meta()[1] is not None


def test_esc50_fixture(tmp_path):
    root = tmp_path / "esc50"
    (root / "meta").mkdir(parents=True)
    (root / "audio").mkdir()
    rows = ["filename,fold,target,category,esc10,src_file,take"]
    rng = np.random.default_rng(0)
    for i in range(6):
        fname = f"1-{i}-A-{i % 3}.wav"
        pcm = (rng.normal(scale=0.05, size=44100) * 32767).astype(np.int16)
        scipy.io.wavfile.write(str(root / "audio" / fname), 44100, pcm)
        rows.append(f"{fname},{i % 5 + 1},{i % 3},cat,{False},x,1")
    (root / "meta" / "esc50.csv").write_text("\n".join(rows))

    from efficientat_tpu.data.esc50 import get_test_set, get_training_set

    train = get_training_set(str(root), fold=1, wavmix=False, roll=False, gain_augment=0)
    test = get_test_set(str(root), fold=1)
    assert len(train) + len(test) == 6
    item = train.get(0, np.random.default_rng(0))
    assert item["wave"].shape == (5 * 32000,)
    assert item["target"].shape == (50,) and item["target"].sum() == 1


def test_dcase20_fixture(tmp_path):
    root = tmp_path / "dcase"
    (root / "evaluation_setup").mkdir(parents=True)
    (root / "audio").mkdir()
    rng = np.random.default_rng(0)
    meta = ["filename\tscene_label\tidentifier\tsource_label"]
    train_rows = ["filename"]
    test_rows = ["filename"]
    for i in range(4):
        fname = f"audio/f{i}.wav"
        pcm = (rng.normal(scale=0.05, size=32000) * 32767).astype(np.int16)
        scipy.io.wavfile.write(str(root / fname), 32000, pcm)
        meta.append(f"{fname}\tscene{i % 2}\tcity{i % 2}-loc\tdevice{i % 2}")
        (train_rows if i < 3 else test_rows).append(fname)
    (root / "meta.csv").write_text("\n".join(meta))
    (root / "evaluation_setup" / "fold1_train.csv").write_text("\n".join(train_rows))
    (root / "evaluation_setup" / "fold1_evaluate.csv").write_text("\n".join(test_rows))

    from efficientat_tpu.data.dcase20 import OneHotMixupDataset, get_test_set, get_training_set

    train = get_training_set(str(root), cache_path=str(tmp_path / "cache"))
    test = get_test_set(str(root))
    assert len(train) == 3 and len(test) == 1
    item = train.get(0, np.random.default_rng(0))
    assert item["wave"].shape == (32000,)
    assert isinstance(item["target"], int)
    assert set(item) >= {"device", "city", "index"}
    # cache hit second time
    item2 = train.get(0, np.random.default_rng(0))
    np.testing.assert_array_equal(item["wave"], item2["wave"])

    mix = OneHotMixupDataset(train, rate=1.0)
    m = mix.get(0, np.random.default_rng(1))
    assert m["target"].shape == (10,)
    assert m["target"].sum() == pytest.approx(1.0)


def test_host_staging_pool_roundtrip_and_reuse():
    """HostStagingPool: exact values through the CPU pass-through (CPU
    device_put is zero-copy, so staging is bypassed there), and correct
    copy-in + slot-reuse bookkeeping on the forced staging path (the
    fresh-mapping device_put cliff fix, data/staging.py)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from efficientat_tpu.data.staging import HostStagingPool

    rng = np.random.default_rng(0)

    # CPU pass-through: values exact, nothing staged, sharding honored
    pool = HostStagingPool(slots=2)
    outs, wants = [], []
    for i in range(5):
        batch = {"wave": rng.normal(size=(4, 64)).astype(np.float32),
                 "target": rng.random((4, 3)).astype(np.float32),
                 "step": np.float32(i)}
        wants.append({k: np.array(v) for k, v in batch.items()})
        outs.append(pool.put(batch))
    for got, want in zip(outs, wants):
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), want[k])
    assert all(not b for b in pool._bufs)  # bypassed: no staging buffers
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    sharded = pool.put(np.arange(8, dtype=np.float32).reshape(2, 4),
                       NamedSharding(mesh, P("data")))
    assert sharded.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), 2)
    np.testing.assert_array_equal(
        np.asarray(sharded), np.arange(8, dtype=np.float32).reshape(2, 4))

    # forced staging (the TPU path): copy-in is exact at put time, slots
    # round-robin, shape changes reallocate without growing the dict
    pool = HostStagingPool(slots=2, stage_on_cpu=True)
    for i in range(5):
        batch = {"wave": rng.normal(size=(4, 64)).astype(np.float32),
                 "step": np.float32(i)}
        got = pool.put(batch)  # read back BEFORE the slot is rewritten
        np.testing.assert_array_equal(np.asarray(got["wave"]), batch["wave"])
        assert float(got["step"]) == float(i)
    assert len(pool._bufs[0]) == 1 and len(pool._bufs[1]) == 1
    buf_id = id(pool._bufs[0][(1, (4, 64), np.dtype(np.float32))])
    got = pool.put({"wave": np.ones((4, 64), np.float32),
                    "step": np.float32(9)})
    assert id(pool._bufs[0][(1, (4, 64), np.dtype(np.float32))]) == buf_id
    got = pool.put({"wave": np.ones((2, 64), np.float32),
                    "step": np.float32(1)})
    assert np.asarray(got["wave"]).shape == (2, 64)
    assert len([k for k in pool._bufs[1] if k[0] == 1]) == 1


def test_int16_waves_transport(tmp_path):
    """int16_waves (half-bandwidth host->device transport): the dataset
    yields int16 PCM exactly as stored, pad/resample preserve the dtype,
    and the guard rejects float host augments."""
    import pytest as _pytest

    path = str(tmp_path / "toy16.hdf")
    rng = np.random.default_rng(3)
    waves = [rng.normal(scale=0.1, size=6000).astype(np.float32)
             for _ in range(2)]
    targets = np.packbits((rng.random((2, 527)) > 0.9).astype(np.uint8), axis=1)
    write_pcm_hdf5(path, waves, targets, ["Ya.mp3", "Yb.mp3"])

    ds16 = open_audio_hdf5(path, clip_length_seconds=0.25, num_classes=527,
                           int16_waves=True)
    dsf = open_audio_hdf5(path, clip_length_seconds=0.25, num_classes=527)
    it16 = ds16.get(0, np.random.default_rng(0))
    itf = dsf.get(0, np.random.default_rng(0))
    assert it16["wave"].dtype == np.int16
    assert it16["wave"].shape == itf["wave"].shape
    # dequantized int16 == the float path exactly (same stored int16)
    np.testing.assert_array_equal(
        it16["wave"].astype(np.float32) / 32768.0, itf["wave"])
    assert it16["wave"][6000:].max() == 0  # int16 zero padding
    with _pytest.raises(ValueError):
        open_audio_hdf5(path, num_classes=527, int16_waves=True,
                        gain_augment=4)


def test_sync_transfer_mode_policy(monkeypatch):
    """EAT_SYNC_TRANSFERS overrides; otherwise keyed to the tunnel env."""
    from efficientat_tpu.data.staging import sync_transfer_mode

    monkeypatch.delenv("EAT_SYNC_TRANSFERS", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert sync_transfer_mode() is False
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert sync_transfer_mode() is True
    monkeypatch.setenv("EAT_SYNC_TRANSFERS", "0")
    assert sync_transfer_mode() is False
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("EAT_SYNC_TRANSFERS", "1")
    assert sync_transfer_mode() is True


def test_loader_slice_determinism_across_thread_counts():
    """Batches must be identical for any num_threads: the intra-batch
    slice fan-out (core.py) may not change item order or RNG streams."""
    from efficientat_tpu.data.core import Dataset, Loader

    class Toy(Dataset):
        def __len__(self):
            return 37

        def get(self, i, rng):
            return {"wave": np.full(5, i, np.float32) + rng.random(),
                    "fname": str(i)}

    ref = None
    for nt in (1, 3, 8):
        ld = Loader(Toy(), 8, num_threads=nt, seed=3)
        got = [b["wave"].copy() for b in ld.epoch(2)]
        if ref is None:
            ref = got
        else:
            assert len(got) == len(ref)
            for a, b in zip(got, ref):
                np.testing.assert_array_equal(a, b)


def test_wave_codecs_roundtrip_and_device_decode():
    """wavecodec (data/wavecodec.py): i16 is exact for int16 PCM; mulaw8
    round-trips at telephony SNR; the traced device decode matches the
    host oracle bit-for-bit; the int16->mulaw table equals the formula."""
    import jax

    from efficientat_tpu.data import wavecodec as wc

    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(scale=0.2, size=8000), -1, 1).astype(np.float32)

    # i16: exact round-trip through device decode for int16 sources
    i16 = wc.encode(x, "i16")
    assert i16.dtype == np.int16
    back = np.asarray(jax.jit(wc.decode_on_device)(i16))
    np.testing.assert_array_equal(back, i16.astype(np.float32) / 32768.0)

    # mulaw8: SNR must beat 30 dB on gaussian audio (it measures ~37-40)
    u8 = wc.encode(x, "mulaw8")
    assert u8.dtype == np.uint8
    dec = wc.mulaw_decode(u8)
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - dec) ** 2))
    assert snr > 30, snr
    # device decode == host oracle
    dev = np.asarray(jax.jit(wc.decode_on_device)(u8))
    np.testing.assert_allclose(dev, dec, rtol=1e-6, atol=1e-7)

    # int16 table path == float formula path
    i = wc.encode(x, "i16")
    np.testing.assert_array_equal(
        wc.encode(i, "mulaw8"), wc.mulaw_encode(i.astype(np.float32) / 32768.0))

    # float32 passthrough + unknown codec guard
    assert wc.encode(x, "f32") is x
    import pytest as _pytest
    with _pytest.raises(ValueError):
        wc.encode(x, "flac")


def test_mulaw8_dataset_and_mel_closeness(tmp_path):
    """A mulaw8 dataset yields uint8; the decoded wave's log-mel stays
    close to the float path (the transport must not visibly distort the
    features the model actually consumes)."""
    import jax

    from efficientat_tpu.data import wavecodec as wc
    from efficientat_tpu.ops.melspec import MelConfig, log_mel_spectrogram

    path = str(tmp_path / "toy8.hdf")
    rng = np.random.default_rng(1)
    t = np.arange(16000) / 32000.0
    waves = [(0.4 * np.sin(2 * np.pi * 440 * t)
              + 0.05 * rng.normal(size=t.size)).astype(np.float32)]
    targets = np.packbits((rng.random((1, 527)) > 0.9).astype(np.uint8), axis=1)
    write_pcm_hdf5(path, waves, targets, ["Yx.mp3"])

    ds8 = open_audio_hdf5(path, clip_length_seconds=0.5, num_classes=527,
                          wave_codec="mulaw8")
    item = ds8.get(0, np.random.default_rng(0))
    assert item["wave"].dtype == np.uint8
    dec = wc.mulaw_decode(item["wave"])

    dsf = open_audio_hdf5(path, clip_length_seconds=0.5, num_classes=527)
    ref = dsf.get(0, np.random.default_rng(0))["wave"]
    cfg = MelConfig()
    mel = lambda w: np.asarray(jax.jit(
        lambda ww: log_mel_spectrogram(ww, cfg))(w[None]))
    # measured ~0.26 max in log space (quantization noise lifts
    # near-floor bins) = ~0.05 in the (x+4.5)/5-normalized features the
    # model sees, vs a ~11.5 log range; bound it so regressions surface
    dev = np.abs(mel(dec.astype(np.float32)) - mel(ref)).max()
    assert dev < 0.4, dev


def test_mulaw8_silence_is_exact():
    """Encoded silence must decode to exactly 0.0 — zero-padded clip
    tails and masked eval regions ride the transport too."""
    from efficientat_tpu.data import wavecodec as wc

    z = np.zeros(16, np.float32)
    u = wc.encode(z, "mulaw8")
    assert (u == 128).all()
    np.testing.assert_array_equal(wc.mulaw_decode(u), z)
    i0 = np.zeros(16, np.int16)
    np.testing.assert_array_equal(wc.mulaw_decode(wc.encode(i0, "mulaw8")), z)
