"""Generate the committed offline demo clip (license-clean, self-made).

The reference ships ``resources/metro_station-paris.wav`` so its
``inference.py`` runs out of the box; this repo is air-gapped, so the demo
asset is SYNTHESIZED: a 10 s "scene" of a 2-tone chime over filtered
noise swells with a click track — deterministic (seed 0), no third-party
audio, 32 kHz mono int16 WAV (~625 KB).

Regenerate with:  python scripts/make_demo_clip.py
Then tag it:      python -m efficientat_tpu.cli tag --audio_path \
                      assets/demo_scene.wav --model_name mn10_as
(see assets/README.md for the expected output shape).
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "assets", "demo_scene.wav")
SR = 32000
SECONDS = 10


def synth() -> np.ndarray:
    t = np.arange(SECONDS * SR) / SR
    rng = np.random.default_rng(0)

    # noise swells: band-limited noise with a slow amplitude envelope
    noise = rng.normal(size=t.size).astype(np.float32)
    # one-pole lowpass ~1.5 kHz
    a = float(np.exp(-2 * np.pi * 1500 / SR))
    for i in range(1, noise.size):
        noise[i] += a * noise[i - 1]
    noise *= 0.04 * (1.0 + np.sin(2 * np.pi * 0.25 * t - np.pi / 2))

    # two-tone chime every 2.5 s (major third, exponential decay)
    chime = np.zeros_like(t, dtype=np.float32)
    for start in (0.5, 3.0, 5.5, 8.0):
        seg = (t >= start) & (t < start + 1.2)
        tt = t[seg] - start
        env = np.exp(-3.0 * tt)
        chime[seg] += 0.25 * env * (np.sin(2 * np.pi * 660 * tt)
                                    + 0.6 * np.sin(2 * np.pi * 830 * tt))

    # click track at 2 Hz (short bursts)
    clicks = np.zeros_like(t, dtype=np.float32)
    for k in range(2 * SECONDS):
        s = int(k * 0.5 * SR)
        clicks[s:s + 160] += 0.3 * np.hanning(160).astype(np.float32)

    wave = noise + chime + clicks
    return (wave / max(1.0, np.abs(wave).max() / 0.9)).astype(np.float32)


def write_golden():
    """Record the deterministic random-weights top-10 for the demo clip
    (assets/demo_golden.txt): the offline expected output of
    ``cli tag --no_pretrained`` — pipeline verification without a
    checkpoint. Weights from PRNGKey(0); probs stable per backend."""
    import warnings

    from efficientat_tpu.infer.tag import Tagger

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tagger = Tagger("mn10_as", pretrained=False)
    tags = tagger.tag(OUT)
    path = os.path.join(HERE, "assets", "demo_golden.txt")
    with open(path, "w") as f:
        f.write("# cli tag --audio_path assets/demo_scene.wav "
                "--model_name mn10_as --no_pretrained\n"
                "# random weights PRNGKey(0); probs tolerance ~1e-3 "
                "across backends\n")
        for label, prob in tags:
            f.write(f"{label}: {prob:.4f}\n")
    print(f"wrote {path}")


def main():
    import scipy.io.wavfile

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    wave = synth()
    scipy.io.wavfile.write(OUT, SR, (wave * 32767.0).astype(np.int16))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
    if "--golden" in sys.argv:
        write_golden()


if __name__ == "__main__":
    main()
