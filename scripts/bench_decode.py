"""Single-core host decode rates (the co-located-host feed bound).

Measures the first-party mp3 decoder and the PCM-HDF5 read path in
clips/s on one core, on synthesized 10 s 64 kbps mono clips (the
AudioSet storage format). Reproduces the decode numbers quoted in
docs/DESIGN.md; multiply by cores for host sizing.

Usage: python scripts/bench_decode.py [n_clips]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import h5py

    sys.path.insert(0, os.path.join(HERE, "tests"))
    import codec_oracles

    from efficientat_tpu.data.audio_io import decode_mp3
    from efficientat_tpu.data.hdf5 import open_audio_hdf5, write_pcm_hdf5
    from efficientat_tpu.utils.host import disable_thp_first_touch

    disable_thp_first_touch()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    sr, secs = 32000, 10
    rng = np.random.default_rng(0)
    t = np.arange(secs * sr) / sr

    blobs, waves = [], []
    for i in range(n):
        w = (0.25 * np.sin(2 * np.pi * (100 + 9.1 * i) * t)
             + 0.05 * rng.normal(size=t.size)).astype(np.float32)
        waves.append(w)
        blobs.append(codec_oracles.encode_mp3_lame(w, sr, bitrate=64,
                                                   mode="mono"))

    decode_mp3(blobs[0])  # load the native lib
    t0 = time.perf_counter()
    for b in blobs:
        decode_mp3(b)
    dt = time.perf_counter() - t0
    print(f"mp3 decode: {n / dt:.1f} clips/s/core "
          f"({n * secs / dt:.0f} audio-s/s)")

    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "bench_pcm.hdf")
    targets = np.zeros((n, 66), np.uint8)
    write_pcm_hdf5(path, waves, targets, [f"Yc{i}.mp3" for i in range(n)])
    for codec in ("f32", "i16", "mulaw8"):
        ds = open_audio_hdf5(path, sample_rate=sr, clip_length_seconds=secs,
                             resample_rate=sr, num_classes=527,
                             wave_codec=codec)
        g = np.random.default_rng(1)
        ds.get(0, g)  # warm the file handle + page cache
        t0 = time.perf_counter()
        for i in range(n):
            ds.get(i, g)
        dt = time.perf_counter() - t0
        print(f"pcm read ({codec}): {n / dt:.1f} clips/s/core")
    os.unlink(path)


if __name__ == "__main__":
    main()
